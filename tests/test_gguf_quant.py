"""Core gguf + quant codec tests: roundtrip accuracy, layout parity,
repacked-layout equivalence with the flat dequant reference."""

import numpy as np
import pytest

from powerserve_tpu.core import gguf as G
from powerserve_tpu.core import quant as Q


@pytest.mark.parametrize("fmt,block,tol", [
    (G.GGMLType.Q4_0, 32, 0.08),
    (G.GGMLType.Q4_1, 32, 0.07),
    (G.GGMLType.Q5_0, 32, 0.04),
    (G.GGMLType.Q8_0, 32, 0.006),
    (G.GGMLType.Q4_K, 256, 0.05),
    (G.GGMLType.Q5_K, 256, 0.03),
    (G.GGMLType.Q6_K, 256, 0.02),
    (G.GGMLType.Q2_K, 256, 0.4),  # 2-bit: coarse by design
    (G.GGMLType.Q3_K, 256, 0.16),
    # IQ4 codebook's widest gap is 24/127 -> worst error ~0.095*amax
    (G.GGMLType.IQ4_NL, 32, 0.11),
    (G.GGMLType.IQ4_XS, 256, 0.11),
])
def test_quant_roundtrip(fmt, block, tol):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4 * block).astype(np.float32)
    payload = Q.quantize(x, fmt)
    assert payload.nbytes == G.tensor_nbytes(fmt, x.size)
    y = Q.dequantize(payload, fmt)
    scale = np.abs(x).max()
    assert np.max(np.abs(x - y)) < tol * scale, f"{fmt}: roundtrip error too big"


def test_q4_0_block_layout():
    """Byte j of a block packs elem j (low nibble) and elem j+16 (high)."""
    x = np.arange(32, dtype=np.float32) - 16  # known values
    payload = Q.quantize_q4_0(x)
    d = payload[:2].copy().view(np.float16).astype(np.float32)[0]
    qs = payload[2:]
    # manual decode per the ggml spec
    lo = (qs & 0xF).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    manual = np.concatenate([lo, hi]).astype(np.float32) * d
    np.testing.assert_allclose(manual, Q.dequantize_q4_0(payload))


def test_q4k_scale_packing_roundtrip():
    rng = np.random.default_rng(1)
    sc = rng.integers(0, 64, (5, 8)).astype(np.uint8)
    mn = rng.integers(0, 64, (5, 8)).astype(np.uint8)
    packed = Q._pack_k_scales(sc, mn)
    sc2, mn2 = Q._unpack_k_scales(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


@pytest.mark.parametrize("fmt", [G.GGMLType.Q4_0, G.GGMLType.Q4_1,
                                 G.GGMLType.Q5_0, G.GGMLType.Q8_0,
                                 G.GGMLType.Q4_K, G.GGMLType.Q5_K,
                                 G.GGMLType.Q6_K, G.GGMLType.Q2_K,
                                 G.GGMLType.Q3_K, G.GGMLType.IQ4_NL,
                                 G.GGMLType.IQ4_XS])
def test_repack_matches_dequant(fmt):
    """Repacked [K, N] layout must decode to the same floats as flat
    dequant. Q4_0/Q8_0/Q4_K repack exactly (native device layouts);
    Q4_1/Q5/Q6 requant on load to per-32 int8 whose step (amax/127) sits
    far inside those formats' own quantization error."""
    rng = np.random.default_rng(2)
    n_out, k_in = 6, 512
    w = rng.standard_normal((n_out, k_in)).astype(np.float32)
    payload = Q.quantize(w, fmt)
    ref = Q.dequantize(payload, fmt).reshape(n_out, k_in)
    qt = Q.repack_gguf_tensor(payload, fmt, (n_out, k_in))
    exact = fmt in (G.GGMLType.Q4_0, G.GGMLType.Q8_0, G.GGMLType.Q4_K)
    tol = 1e-5 if exact else 0.01 * np.abs(ref).max()
    np.testing.assert_allclose(qt.dequant(), ref.T, rtol=1e-5, atol=tol)


def test_repack_f16_quantizes_to_q8():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((4, 64)).astype(np.float32)
    payload = Q.quantize(w, G.GGMLType.F16)
    qt = Q.repack_gguf_tensor(payload, G.GGMLType.F16, (4, 64))
    assert qt.ggml_type == G.GGMLType.Q8_0
    np.testing.assert_allclose(qt.dequant(), w.T, rtol=0.02, atol=0.02)


@pytest.mark.parametrize("signed", [True, False])
def test_nib4_pack_roundtrip(signed):
    rng = np.random.default_rng(4)
    if signed:
        q = rng.integers(-8, 8, (64, 16)).astype(np.int8)
        out = Q.unpack_nib4_signed(Q.pack_nib4(q, signed_bias=True))
    else:
        q = rng.integers(0, 16, (64, 16)).astype(np.int8)
        out = Q.unpack_nib4_unsigned(Q.pack_nib4(q))
    np.testing.assert_array_equal(q, out)


@pytest.mark.parametrize("fmt", [G.GGMLType.Q2_K, G.GGMLType.Q3_K,
                                 G.GGMLType.IQ4_XS])
def test_load_and_decode_extended_formats(tmp_path, fmt):
    """End-to-end: a workspace quantized in the extended zoo loads and
    greedy-decodes (real llama.cpp files mix these formats; reference
    ggml decodes the full zoo, libs/ggml/include/ggml.h:398-412)."""
    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.generator import InferenceEngine
    from powerserve_tpu.models.loader import load_gguf_model
    from powerserve_tpu.tools.synthetic import make_synthetic_gguf

    ws = tmp_path / f"ws_{int(fmt)}"
    # tiny-k: 256-divisible dims as K-superblocks require
    make_synthetic_gguf(ws, "tiny-k", fmt, seed=0, seq_len=128)
    cfg, params = load_gguf_model(ws / "model")
    hp = HyperParams(max_slots=1, batch_size=8)
    eng = InferenceEngine(params, cfg, hp, backend="xla")
    eng.hp.sampler.temperature = 0.0
    out = list(eng.generate([3, 17, 5], 4))
    assert len(out) == 4 and all(0 <= t < cfg.llm.vocab_size for t in out)


def test_gguf_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    w = G.GGUFWriter()
    w.metadata["general.architecture"] = "llama"
    w.metadata["llama.block_count"] = 2
    w.metadata["tokenizer.ggml.tokens"] = ["<s>", "</s>", "hello"]
    w.metadata["tokenizer.ggml.scores"] = [0.0, -1.0, -2.0]
    w.metadata["llama.rope.freq_base"] = 10000.0
    a = rng.standard_normal((8, 64)).astype(np.float32)
    b = rng.standard_normal((4, 256)).astype(np.float32)
    w.add_float_tensor("a.weight", a)
    w.add_tensor("b.weight", (256, 4), G.GGMLType.Q4_K, Q.quantize(b, G.GGMLType.Q4_K))
    path = tmp_path / "test.gguf"
    w.write(path)

    with G.GGUFReader(path) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["llama.block_count"] == 2
        assert list(r.metadata["tokenizer.ggml.tokens"]) == ["<s>", "</s>", "hello"]
        assert abs(r.metadata["llama.rope.freq_base"] - 10000.0) < 1e-6
        np.testing.assert_allclose(r.tensor_float("a.weight"), a)
        assert r.tensors["b.weight"].shape == (4, 256)
        got = r.tensor_float("b.weight")
        assert np.max(np.abs(got - b)) < 0.08 * np.abs(b).max()


def test_workspace_config(tmp_path):
    import json

    from powerserve_tpu.core import HyperParams, ModelConfig, WorkspaceConfig

    ws = tmp_path
    (ws / "main_model").mkdir()
    (ws / "workspace.json").write_text(json.dumps({
        "model_main": "main_model", "model_draft": "",
        "hparams_config": "hparams.json",
    }))
    (ws / "hparams.json").write_text(json.dumps({
        "batch_size": 64, "max_slots": 4,
        "sampler": {"temperature": 0.5, "top_k": 20},
    }))
    mc = ModelConfig()
    mc.llm.dim = 128
    mc.save(ws / "main_model" / "model.json")

    cfg = WorkspaceConfig.load(ws)
    assert cfg.draft_model_dir is None
    assert cfg.hyper_params.batch_size == 64
    assert cfg.hyper_params.sampler.temperature == 0.5
    mc2 = ModelConfig.load(ws / "main_model" / "model.json")
    assert mc2.llm.dim == 128
    assert mc2.arch == "llama"
