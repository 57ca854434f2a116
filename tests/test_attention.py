"""Attention op tests: chunked online-softmax vs dense, visibility
building."""

import numpy as np
import jax.numpy as jnp

from powerserve_tpu.ops.attention import (
    _gqa_chunked,
    _gqa_dense,
    build_visibility,
    gqa_attention,
)


def _rand_case(S=2, Tq=4, T=96, H=4, Hkv=2, D=16, seed=0, frac_visible=0.7):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((S, Tq, H, D)).astype(np.float32)
    k = rng.standard_normal((S, Hkv, T, D)).astype(np.float32)
    v = rng.standard_normal((S, Hkv, T, D)).astype(np.float32)
    vis = rng.uniform(size=(S, Tq, T)) < frac_visible
    vis[..., 0] = True  # keep every query defined
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(vis))


def test_chunked_matches_dense():
    q, k, v, vis = _rand_case()
    dense = np.asarray(_gqa_dense(q, k, v, vis, 0.25))
    for chunk in (32, 48, 96):
        ch = np.asarray(_gqa_chunked(q, k, v, vis, 0.25, chunk))
        np.testing.assert_allclose(ch, dense, rtol=2e-2, atol=2e-2)


def test_chunked_with_padding():
    # T=100 not divisible by 32 -> internal padding path
    q, k, v, vis = _rand_case(T=100)
    dense = np.asarray(_gqa_dense(q, k, v, vis, 0.25))
    ch = np.asarray(_gqa_chunked(q, k, v, vis, 0.25, 32))
    np.testing.assert_allclose(ch, dense, rtol=2e-2, atol=2e-2)


def test_gqa_dispatches_by_length():
    q, k, v, vis = _rand_case(T=64)
    out = gqa_attention(q, k, v, vis, 0.25, chunk=32)
    assert out.shape == (2, 4, 4 * 16)


def test_fully_masked_rows_are_finite():
    q, k, v, vis = _rand_case()
    vis = jnp.zeros_like(vis)
    out = np.asarray(_gqa_chunked(q, k, v, vis, 0.25, 32))
    assert np.isfinite(out).all()


def test_build_visibility_causal():
    cache_mask = jnp.asarray([[True, True, False, False, False]])
    positions = jnp.asarray([[2, 3]])  # two new tokens at pos 2, 3
    vis = np.asarray(build_visibility(cache_mask, positions, None))
    # query 0 (pos 2): sees cache 0,1 and itself (2), not 3
    assert vis[0, 0].tolist() == [True, True, True, False, False]
    # query 1 (pos 3): sees 0,1,2,3
    assert vis[0, 1].tolist() == [True, True, True, True, False]


def test_build_visibility_tree_mask():
    cache_mask = jnp.asarray([[True, False, False, False]])
    positions = jnp.asarray([[1, 2, 3]])
    # tree: node0 root; node1, node2 siblings under root
    intra = jnp.asarray([[True, False, False],
                         [True, True, False],
                         [True, False, True]])
    vis = np.asarray(build_visibility(cache_mask, positions, intra))
    assert vis[0, 1].tolist() == [True, True, True, False]  # sees root+self
    assert vis[0, 2].tolist() == [True, True, False, True]  # sibling hidden


def test_quant_attention_matches_dequant():
    """Scale-folded int8 attention must match dequantize-then-attend."""
    from powerserve_tpu.ops.attention import gqa_attention_quant

    rng = np.random.default_rng(7)
    S, Tq, T, H, Hkv, D = 2, 3, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, T, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, T, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    vis = jnp.asarray(rng.uniform(size=(S, Tq, T)) < 0.8)
    vis = vis.at[..., 0].set(True)
    kf = kq.astype(jnp.float32) * ks[..., None]
    vf = vq.astype(jnp.float32) * vs[..., None]
    ref = np.asarray(_gqa_dense(q, kf, vf, vis, 0.25))
    for chunk in (64, 32):  # dense path and chunked path
        got = np.asarray(gqa_attention_quant(q, kq, ks, vq, vs, vis, 0.25,
                                             chunk=chunk))
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_flash_decode_interpret_matches_xla():
    """Pallas flash-decode kernel (interpret mode) vs the XLA quant path."""
    from powerserve_tpu.ops.attention import gqa_attention_quant
    from powerserve_tpu.ops.flash_decode import flash_decode_quant

    rng = np.random.default_rng(9)
    S, Tq, T, H, Hkv, D = 2, 1, 256, 8, 2, 128
    q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, T, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, T, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    vis = jnp.asarray(rng.uniform(size=(S, Tq, T)) < 0.8)
    vis = vis.at[..., 0].set(True)
    ref = np.asarray(gqa_attention_quant(q, kq, ks, vq, vs, vis, 0.088))
    got = np.asarray(flash_decode_quant(q, kq, ks, vq, vs, vis, 0.088,
                                        chunk=128, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_flash_dispatch_via_backend():
    """backend="pallas_interpret" routes decode shapes at T>=2048 to the
    flash kernel; result matches the XLA path."""
    from powerserve_tpu.ops.attention import gqa_attention_quant

    rng = np.random.default_rng(11)
    S, Tq, T, H, Hkv, D = 1, 1, 2048, 4, 2, 128
    q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, T, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, T, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    vis = jnp.asarray(rng.uniform(size=(S, Tq, T)) < 0.8)
    vis = vis.at[..., 0].set(True)
    ref = np.asarray(gqa_attention_quant(q, kq, ks, vq, vs, vis, 0.088))
    got = np.asarray(gqa_attention_quant(q, kq, ks, vq, vs, vis, 0.088,
                                         backend="pallas_interpret"))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
