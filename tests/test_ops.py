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
