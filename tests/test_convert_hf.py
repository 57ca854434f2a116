"""HF -> workspace converter round-trip: convert a tiny random HF llama,
load the workspace, compare logits with transformers."""

import numpy as np
import jax.numpy as jnp
import pytest

from powerserve_tpu.kv import KVCache
from powerserve_tpu.models import forward, load_gguf_model
from powerserve_tpu.tools.convert_hf import convert_hf_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_convert_roundtrip(tmp_path):
    from tests.test_model_golden import _mk_hf_llama

    torch.manual_seed(0)
    model, _ = _mk_hf_llama(vocab=512, dim=64)
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)

    ws = convert_hf_model(hf_dir, tmp_path / "ws", quant="q8_0")
    cfg, params = load_gguf_model(ws / "model")
    assert cfg.arch == "llama"
    assert cfg.llm.dim == 64
    assert cfg.llm.rope.rope_type == 2  # NEOX: unpermuted HF weights

    T = 8
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 512, (1, T))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()[0]

    kv = KVCache.create(cfg.llm.n_layers, 1, 32, cfg.llm.n_kv_heads,
                        cfg.llm.head_size, dtype="bf16")
    logits, _ = forward(params, cfg.llm, kv, jnp.asarray(tokens),
                        jnp.arange(T)[None, :], backend="xla",
                        logits_mode="all")
    got = np.asarray(logits)[0]
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"corr {corr}"
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.08, f"rel {rel}"


def test_convert_qwen_bias(tmp_path):
    from tests.test_model_golden import _mk_hf_llama

    torch.manual_seed(1)
    model, _ = _mk_hf_llama(qwen=True, vocab=512, dim=64)
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)
    ws = convert_hf_model(hf_dir, tmp_path / "ws", quant="q8_0")
    cfg, params = load_gguf_model(ws / "model", stacked=False)
    assert cfg.arch == "qwen2"
    lw = params.layers[0]
    # qkv bias survived (fused by default)
    assert (lw.bqkv is not None) or (lw.bq is not None)


def test_convert_rope_scaling_roundtrip(tmp_path):
    """HF rope_scaling must survive convert -> GGUF metadata -> loader
    (VERDICT r1 item 2: previously silently dropped)."""
    from tests.test_model_golden import _mk_hf_llama_scaled

    torch.manual_seed(5)
    rs = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
          "high_freq_factor": 4.0, "original_max_position_embeddings": 64}
    model, _ = _mk_hf_llama_scaled(rs, seq=1024)
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)

    ws = convert_hf_model(hf_dir, tmp_path / "ws", quant="q8_0")
    cfg, params = load_gguf_model(ws / "model")
    rope = cfg.llm.rope
    assert rope.scaling_type == "llama3"
    assert rope.scaling_factor == 8.0
    assert rope.n_ctx_orig == 64
    assert rope.low_freq_factor == 1.0 and rope.high_freq_factor == 4.0

    # logits past the original context window match transformers
    T, start = 6, 150
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 256, (1, start + T))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()[0, start:]
    kv = KVCache.create(cfg.llm.n_layers, 1, 256, cfg.llm.n_kv_heads,
                        cfg.llm.head_size, dtype="bf16")
    logits, _ = forward(params, cfg.llm, kv, jnp.asarray(tokens),
                        jnp.arange(start + T)[None, :], backend="xla",
                        logits_mode="all")
    got = np.asarray(logits)[0, start:]
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"corr {corr}"


def test_convert_qwen3_qk_norm_head_dim(tmp_path):
    """Qwen3 round-trip: QK-norm tensors and a head_dim decoupled from
    dim/n_heads (attention.key_length) survive convert -> load, logits
    match transformers."""
    torch.manual_seed(0)
    hf_cfg = transformers.Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=32,  # != 64/4
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False)
    model = transformers.Qwen3ForCausalLM(hf_cfg)
    model.eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)

    ws = convert_hf_model(hf_dir, tmp_path / "ws", quant="q8_0")
    cfg, params = load_gguf_model(ws / "model")
    assert cfg.arch == "qwen3"
    assert cfg.llm.head_size == 32
    assert params.layers.q_norm is not None

    T = 8
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 512, (1, T))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()[0]
    kv = KVCache.create(cfg.llm.n_layers, 1, 32, cfg.llm.n_kv_heads,
                        cfg.llm.head_size, dtype="bf16")
    logits, _ = forward(params, cfg.llm, kv, jnp.asarray(tokens),
                        jnp.arange(T)[None, :], backend="xla",
                        logits_mode="all")
    got = np.asarray(logits)[0]
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, corr
