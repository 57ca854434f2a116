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


def test_flash_prefill_interpret_matches_xla():
    """Pallas flash-prefill kernel (interpret mode) vs the XLA quant
    path, on the standard prefill pattern: committed prefix + a
    contiguous new batch with end padding, ragged T/Tq vs tile sizes."""
    from powerserve_tpu.ops.attention import (build_visibility,
                                              gqa_attention_quant)
    from powerserve_tpu.ops.flash_prefill import flash_prefill_quant

    rng = np.random.default_rng(13)
    S, Tq, T, H, Hkv, D = 2, 48, 320, 8, 2, 128
    starts = np.asarray([17, 0], np.int32)  # per-slot committed lengths
    n_real = np.asarray([48, 33], np.int32)  # slot 1 pads 15 lanes
    q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, T, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, T, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    cache_mask = np.zeros((S, T), bool)
    positions = np.full((S, Tq), -1, np.int32)
    for s in range(S):
        cache_mask[s, :starts[s]] = True
        positions[s, :n_real[s]] = starts[s] + np.arange(n_real[s])
    vis = build_visibility(jnp.asarray(cache_mask), jnp.asarray(positions),
                           None)
    ref = np.asarray(gqa_attention_quant(q, kq, ks, vq, vs, vis, 0.088))
    got = np.asarray(flash_prefill_quant(
        q, kq, ks, vq, vs, jnp.asarray(cache_mask),
        jnp.asarray(starts), 0.088, qb=32, chunk=128, interpret=True))
    # compare only the real (non-padded) query rows
    for s in range(S):
        np.testing.assert_allclose(got[s, :n_real[s]], ref[s, :n_real[s]],
                                   rtol=3e-2, atol=3e-2)


def test_flash_prefill_env_dispatch(monkeypatch):
    """POWERSERVE_FLASH_PREFILL=interpret routes eligible prefill calls
    through the kernel inside the full forward(); greedy outputs equal
    the XLA path end-to-end."""
    import powerserve_tpu.ops.attention as att
    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.generator import InferenceEngine
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params("tiny", "q8_0")
    hp = HyperParams(max_slots=1, batch_size=64)
    hp.max_seq_len = 128

    def run():
        eng = InferenceEngine(params, cfg, hp, backend="xla")
        eng.hp.sampler.temperature = 0.0
        return list(eng.generate(list(range(3, 43)), 6))

    want = run()
    monkeypatch.setattr(att, "_FLASH_PREFILL", "interpret")
    got = run()
    assert got == want, (got, want)


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
