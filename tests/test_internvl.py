"""InternVL VLM tests: vision tower golden vs transformers, pixel
shuffle parity, multimodal logits vs InternVLForConditionalGeneration,
dynamic tiling preprocessing."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from powerserve_tpu.kv import KVCache  # noqa: E402
from powerserve_tpu.models.internvl import (  # noqa: E402
    find_best_tile_grid,
    internvl_from_hf,
    preprocess_image,
)
from powerserve_tpu.models.vit import encode_images, vision_encode  # noqa: E402


def _mk_hf_internvl(seed=0):
    from transformers import (
        InternVLConfig,
        InternVLForConditionalGeneration,
        Qwen2Config,
    )
    from transformers.models.internvl.configuration_internvl import (
        InternVLVisionConfig,
    )

    torch.manual_seed(seed)
    vc = InternVLVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=[56, 56], patch_size=[14, 14])
    tc = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0)
    cfg = InternVLConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                         image_token_id=250, downsample_ratio=0.5)
    # 56/14 = 4x4 patches -> pixel shuffle 0.5 -> 2x2 = 4 image tokens
    cfg.image_seq_length = 4
    m = InternVLForConditionalGeneration(cfg)
    m.eval()
    return m


def test_vision_tower_matches_hf():
    m = _mk_hf_internvl()
    ours = internvl_from_hf(m)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = m.model.vision_tower(
            pixel_values=torch.tensor(px)).last_hidden_state.numpy()[:, 1:]
    got = np.asarray(vision_encode(ours.vision, jnp.asarray(px)))
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"vision corr {corr}"
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.05


def test_image_features_match_hf():
    m = _mk_hf_internvl(1)
    ours = internvl_from_hf(m)
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = m.model.get_image_features(
            pixel_values=torch.tensor(px)).numpy()
    got = np.asarray(encode_images(ours.vision, jnp.asarray(px)))
    assert got.shape == ref.shape  # [1, 4, 64]
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"projector corr {corr}"


def test_multimodal_logits_match_hf():
    m = _mk_hf_internvl(2)
    ours = internvl_from_hf(m)
    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    # prompt: text tokens with 4 image-context slots
    ids = [1, 250, 250, 250, 250, 7, 9, 11]
    with torch.no_grad():
        ref = m(input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(px)).logits.numpy()[0, -1]
    llm = ours.cfg.llm
    kv = KVCache.create(llm.n_layers, 1, 32, llm.n_kv_heads, llm.head_size,
                        dtype="bf16")
    logits, kv = ours.prefill_multimodal(kv, np.asarray(ids), px,
                                         backend="xla")
    got = np.asarray(logits)[0]
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, f"vlm logits corr {corr}"


def test_expand_image_tokens():
    m = _mk_hf_internvl(3)
    ours = internvl_from_hf(m)
    out = ours.expand_image_tokens([5, 250, 6], n_tiles=2)
    assert out == [5] + [250] * 8 + [6]
    out2 = ours.expand_image_tokens([5, 6], n_tiles=1)
    assert out2 == [250] * 4 + [5, 6]


def test_tile_grid_selection():
    assert find_best_tile_grid(448, 448, max_num=12) == (1, 1)
    cols, rows = find_best_tile_grid(896, 448, max_num=12)
    assert cols / rows == 2
    cols, rows = find_best_tile_grid(448, 1344, max_num=12)
    assert rows / cols == 3


def test_preprocess_image_tiles():
    img = (np.random.default_rng(0).uniform(0, 255, (300, 600, 3))
           ).astype(np.uint8)
    px = preprocess_image(img, tile=448, max_num=6)
    # 2:1 aspect -> 2x1 grid + thumbnail = 3 tiles
    assert px.shape == (3, 3, 448, 448)
    assert px.dtype == np.float32
    assert abs(px.mean()) < 3.0  # normalized


def test_vlm_gguf_workspace_roundtrip(tmp_path):
    """save_pretrained -> convert_internvl -> internvl_from_workspace:
    the GGUF-native VLM matches the HF-loaded one (vision exactly, text
    config fields; logits path covered by the multimodal golden test)."""
    from powerserve_tpu.models.internvl import internvl_from_workspace
    from powerserve_tpu.tools.convert_hf import convert_internvl

    m = _mk_hf_internvl()
    src = tmp_path / "hf"
    m.save_pretrained(src)
    ws = tmp_path / "ws"
    convert_internvl(src, ws, quant="q8_0")

    ivl = internvl_from_workspace(ws / "model")
    ref = internvl_from_hf(m)
    assert ivl.image_token_id == ref.image_token_id
    assert ivl.tokens_per_tile == ref.tokens_per_tile
    assert ivl.image_size == ref.image_size
    assert ivl.cfg.llm.n_layers == ref.cfg.llm.n_layers
    assert ivl.cfg.llm.vocab_size == ref.cfg.llm.vocab_size

    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    a = np.asarray(encode_images(ivl.vision, jnp.asarray(px)))
    b = np.asarray(encode_images(ref.vision, jnp.asarray(px)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    # multimodal prefill end-to-end on the GGUF-loaded model
    ids = ivl.expand_image_tokens([5, 250, 9], n_tiles=1)
    kv = KVCache.create(ivl.cfg.llm.n_layers, 1, 64,
                        ivl.cfg.llm.n_kv_heads, ivl.cfg.llm.head_size)
    logits, _ = ivl.prefill_multimodal(kv, np.asarray(ids, np.int32), px,
                                       backend="xla")
    kv2 = KVCache.create(ivl.cfg.llm.n_layers, 1, 64,
                         ivl.cfg.llm.n_kv_heads, ivl.cfg.llm.head_size)
    logits2, _ = ref.prefill_multimodal(kv2, np.asarray(ids, np.int32), px,
                                        backend="xla")
    # both q8_0-quantized paths: argmax must agree
    assert int(np.argmax(np.asarray(logits))) == \
        int(np.argmax(np.asarray(logits2)))
