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
    k = rng.standard_normal((S, T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((S, T, Hkv, D)).astype(np.float32)
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
