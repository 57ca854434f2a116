"""Op-level tests on the CPU backend: XLA qmatmul vs numpy dequant golden,
Pallas kernel in interpreter mode, rope/norm vs reference math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.core.quant import dequantize, quantize
from powerserve_tpu.ops import (
    QLinear,
    apply_rope,
    qmatmul,
    rms_norm,
    rope_cos_sin,
    silu_hadamard,
    ROPE_TYPE_NEOX,
    ROPE_TYPE_NORM,
)


def _golden(w, x, fmt):
    wq = dequantize(quantize(np.ascontiguousarray(w.T), fmt), fmt)
    return x @ wq.reshape(w.shape[1], w.shape[0]).T


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K])
@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
def test_qmatmul_matches_numpy(fmt, backend):
    rng = np.random.default_rng(0)
    K, N, M = 256, 256, 4
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    x = rng.standard_normal((M, K)).astype(np.float32)
    lin = QLinear.from_float(w, fmt)
    ref = _golden(w, x, fmt)
    y = np.asarray(qmatmul(jnp.asarray(x), lin, backend=backend,
                           compute_dtype=jnp.float32))
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 2e-5, f"{fmt} {backend}: rel err {rel}"


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
def test_qmatmul_unpacked(fmt):
    rng = np.random.default_rng(1)
    K, N, M = 256, 128, 2
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    lin = QLinear.from_float(w, fmt, pack=False)
    assert not lin.packed
    ref = _golden(w, x, fmt)
    y = np.asarray(qmatmul(jnp.asarray(x), lin, backend="xla",
                           compute_dtype=jnp.float32))
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5


def test_qmatmul_3d_input():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    lin = QLinear.from_float(w, GGMLType.Q8_0)
    y = np.asarray(qmatmul(jnp.asarray(x), lin, backend="xla"))
    assert y.shape == (2, 3, 32)


def test_qmatmul_jittable():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    lin = QLinear.from_float(w, GGMLType.Q4_0)

    @jax.jit
    def f(x, lin):
        return qmatmul(x, lin, backend="xla")

    y = f(jnp.ones((2, 64)), lin)
    assert y.shape == (2, 32)
    # QLinear must be a proper pytree
    leaves = jax.tree_util.tree_leaves(lin)
    assert len(leaves) == 2  # q, scales (no bias for Q4_0)


def test_rms_norm():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5))
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_silu_hadamard():
    g = np.array([[0.5, -1.0, 2.0]], dtype=np.float32)
    u = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    got = np.asarray(silu_hadamard(jnp.asarray(g), jnp.asarray(u)))
    ref = g / (1 + np.exp(-g)) * u
    np.testing.assert_allclose(got, ref, rtol=1e-6)


@pytest.mark.parametrize("rope_type", [ROPE_TYPE_NEOX, ROPE_TYPE_NORM])
def test_rope_rotation_properties(rope_type):
    """RoPE must preserve norms and be position-additive in angle."""
    from powerserve_tpu.core.config import RopeConfig

    rng = np.random.default_rng(5)
    cfg = RopeConfig(freq_base=10000.0)
    T, H, D = 5, 2, 64
    x = rng.standard_normal((T, H, D)).astype(np.float32)
    pos = jnp.arange(T)
    cos, sin = rope_cos_sin(pos, cfg, D)
    y = np.asarray(apply_rope(jnp.asarray(x), cos, sin, rope_type))
    # norm preservation
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4)
    # position 0 is identity
    cos0, sin0 = rope_cos_sin(jnp.zeros(1), cfg, D)
    y0 = np.asarray(apply_rope(jnp.asarray(x[:1]), cos0, sin0, rope_type))
    np.testing.assert_allclose(y0, x[:1], rtol=1e-5, atol=1e-5)


def test_rope_dot_product_invariance():
    """<rope(q, p1), rope(k, p2)> depends only on p1 - p2 (NEOX style)."""
    from powerserve_tpu.core.config import RopeConfig

    rng = np.random.default_rng(6)
    cfg = RopeConfig()
    D = 32
    q = rng.standard_normal((1, 1, D)).astype(np.float32)
    k = rng.standard_normal((1, 1, D)).astype(np.float32)

    def dot_at(p1, p2):
        c1, s1 = rope_cos_sin(jnp.array([p1]), cfg, D)
        c2, s2 = rope_cos_sin(jnp.array([p2]), cfg, D)
        qr = np.asarray(apply_rope(jnp.asarray(q), c1, s1, ROPE_TYPE_NEOX))
        kr = np.asarray(apply_rope(jnp.asarray(k), c2, s2, ROPE_TYPE_NEOX))
        return float((qr * kr).sum())

    assert abs(dot_at(3, 1) - dot_at(7, 5)) < 1e-3
    assert abs(dot_at(3, 1) - dot_at(4, 1)) > 1e-4  # sanity: not constant


# ---------------------------------------------------------------------------
# W8 MXU format (int8 weights, per-128 scales on partial sums)
# ---------------------------------------------------------------------------

def _mk_w8(K=512, N=256, fmt=GGMLType.Q4_K, seed=0):
    from powerserve_tpu.core.quant import repack_gguf_tensor

    rng = np.random.default_rng(seed)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    payload = quantize(np.ascontiguousarray(w.T), fmt)
    qt = repack_gguf_tensor(payload, fmt, (N, K))
    return qt, QLinear.from_quantized(qt, mxu=True)


def test_requantize_w8_accuracy():
    """W8 requantization must stay well inside the source format's own
    quantization error (q4k step ~ amax/7 per 32-block; w8 step =
    amax/127 per 128-block)."""
    qt, lin = _mk_w8()
    assert lin.scale_group == 128
    assert lin.q.dtype == jnp.int8 and lin.bias is None
    wq = (np.asarray(lin.q).astype(np.float32)
          * np.repeat(np.asarray(lin.scales), 128, axis=0))
    wexact = qt.dequant()
    rms = np.sqrt(((wq - wexact) ** 2).mean() / (wexact ** 2).mean())
    assert rms < 0.02, rms


@pytest.mark.parametrize("a8", [False, True])
def test_qmatmul_mxu8_kernel_matches_xla(a8):
    import importlib

    qm = importlib.import_module("powerserve_tpu.ops.qmatmul")
    _, lin = _mk_w8()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 512)), jnp.bfloat16)
    ref = np.asarray(qmatmul(x, lin, backend="xla"))
    old = qm._ENV_A8
    try:
        qm._ENV_A8 = a8
        got = np.asarray(qmatmul(x, lin, backend="pallas_interpret"))
    finally:
        qm._ENV_A8 = old
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    # a16 is exact vs the dequant matmul; a8 adds per-token int8 noise
    assert rel < (0.03 if a8 else 0.01), rel


def test_qmatmul_mxu8_stacked_prefetch():
    """Stacked [L, ...] weights with a traced layer index (scan path)."""
    import dataclasses
    import importlib

    qm = importlib.import_module("powerserve_tpu.ops.qmatmul")
    _, l0 = _mk_w8(seed=0)
    _, l1 = _mk_w8(seed=1)
    stacked = dataclasses.replace(
        l0, q=jnp.stack([l0.q, l1.q]), scales=jnp.stack([l0.scales, l1.scales]))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.bfloat16)
    for i, single in enumerate((l0, l1)):
        ref = np.asarray(qmatmul(x, single, backend="xla"))
        got = np.asarray(qmatmul(x, stacked, backend="pallas_interpret",
                                 layer=jnp.asarray(i)))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 0.03, (i, rel)


def test_w8_gguf_load_logits_parity(tmp_path):
    """Loading a workspace with mxu=True must reproduce the gguf-format
    logits (requantization-level tolerance)."""
    from powerserve_tpu.kv import KVCache
    from powerserve_tpu.models import forward, load_gguf_model
    from powerserve_tpu.tools.synthetic import make_synthetic_gguf

    make_synthetic_gguf(tmp_path, "tiny", GGMLType.Q4_K, seed=0, seq_len=128)
    cfg, p_ref = load_gguf_model(tmp_path / "model")
    _, p_w8 = load_gguf_model(tmp_path / "model", mxu=True)
    T = 6
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 200, (1, T)))
    pos = jnp.arange(T)[None, :]

    def logits_of(params):
        kv = KVCache.create(cfg.llm.n_layers, 1, 32, cfg.llm.n_kv_heads,
                            cfg.llm.head_size, dtype="bf16")
        lg, _ = forward(params, cfg.llm, kv, toks, pos, backend="xla",
                        logits_mode="all")
        return np.asarray(lg)[0]

    a, b = logits_of(p_ref), logits_of(p_w8)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999, corr


def test_qmm_tune_table_selection(tmp_path):
    """Per-shape autotune entries override the global knob defaults and
    keep the kernel numerically correct; absent shapes fall back."""
    import importlib
    import json

    qmm = importlib.import_module("powerserve_tpu.ops.qmatmul")

    old = qmm._TUNE.copy()
    try:
        qmm._TUNE.clear()
        assert qmm._select_knobs(1, 256, 512) == (qmm._ENV_BN,
                                                  qmm._ENV_GROUPS)
        tune = {"decode:256:512": {"bn": 128, "groups": 1},
                "prefill:256:512": {"bn": 256, "groups": 2}}
        f = tmp_path / "qmm_tune.json"
        f.write_text(json.dumps(tune))
        assert qmm.load_tune_table(f) == 2
        assert qmm._select_knobs(1, 256, 512) == (128, 1)
        assert qmm._select_knobs(64, 256, 512) == (256, 2)
        assert qmm._select_knobs(1, 999, 512) == (qmm._ENV_BN,
                                                  qmm._ENV_GROUPS)
        assert qmm.load_tune_table(tmp_path / "missing.json") == 0

        # kernel correctness under the overridden knobs
        rng = np.random.default_rng(5)
        K, N = 256, 512
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
        x = rng.standard_normal((1, K)).astype(np.float32)
        lin = QLinear.from_float(w, GGMLType.Q4_0)
        ref = _golden(w, x, GGMLType.Q4_0)
        y = np.asarray(qmatmul(jnp.asarray(x), lin,
                               backend="pallas_interpret",
                               compute_dtype=jnp.float32))
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 2e-5, rel
    finally:
        qmm._TUNE.clear()
        qmm._TUNE.update(old)


def test_qmm_tune_loaded_from_workspace(tmp_path):
    """load_gguf_model picks up qmm_tune.json beside weights.gguf."""
    import importlib
    import json

    qmm = importlib.import_module("powerserve_tpu.ops.qmatmul")
    from powerserve_tpu.core.gguf import GGMLType as G
    from powerserve_tpu.models.loader import load_gguf_model
    from powerserve_tpu.tools.synthetic import make_synthetic_gguf

    ws = tmp_path / "ws"
    make_synthetic_gguf(ws, "tiny", G.Q8_0, seed=0, seq_len=64)
    (ws / "model" / "qmm_tune.json").write_text(
        json.dumps({"decode:64:64": {"bn": 64, "groups": 1}}))
    old = qmm._TUNE.copy()
    try:
        qmm._TUNE.clear()
        load_gguf_model(ws / "model")
        assert qmm._select_knobs(1, 64, 64) == (64, 1)
    finally:
        qmm._TUNE.clear()
        qmm._TUNE.update(old)
