"""Deferred KV-update forward == inline forward.

kv_update="deferred" keeps the layer scan free of cache-slab scatters
(the new K/V ride as in-flight attention blocks and commit in one
post-scan write). Numerics must match the inline path, which writes
quantized K/V then reads them back — both see identical int8 values, so
only softmax summation order differs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.models.llama import forward
from powerserve_tpu.ops.attention import (
    build_visibility,
    gqa_attention_quant,
    gqa_attention_quant_deferred,
)
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS


def _mk(preset="tiny", S=2, T=64):
    cfg, params = make_device_params(preset, "q8_0", stacked=True)
    llm = cfg.llm
    kv = KVCache.create(llm.n_layers, S, T, llm.n_kv_heads, llm.head_size,
                        dtype="int8")
    return llm, params, kv


def _run(llm, params, kv, tokens, positions, kv_update, **kw):
    logits, kv2 = forward(params, llm, kv, tokens, positions,
                          backend="xla", logits_mode="all",
                          kv_update=kv_update, **kw)
    return np.asarray(logits), kv2


@pytest.mark.parametrize("tq", [1, 4])
def test_deferred_matches_inline(tq):
    llm, params, kv0 = _mk()
    S = 2
    rng = np.random.default_rng(0)
    # prefill 8 tokens inline on both (shared starting state)
    ptok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, 8)), jnp.int32)
    ppos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
    _, kv = forward(params, llm, kv0, ptok, ppos, backend="xla",
                    logits_mode="none")

    tok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, tq)), jnp.int32)
    pos = 8 + jnp.broadcast_to(jnp.arange(tq, dtype=jnp.int32), (S, tq))
    li, kvi = _run(llm, params, kv, tok, pos, "inline")
    ld, kvd = _run(llm, params, kv, tok, pos, "deferred")
    np.testing.assert_allclose(ld, li, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(kvd.mask), np.asarray(kvi.mask))
    np.testing.assert_array_equal(np.asarray(kvd.pos), np.asarray(kvi.pos))
    np.testing.assert_array_equal(np.asarray(kvd.k), np.asarray(kvi.k))
    np.testing.assert_array_equal(np.asarray(kvd.v), np.asarray(kvi.v))
    np.testing.assert_allclose(np.asarray(kvd.k_scale),
                               np.asarray(kvi.k_scale), rtol=1e-6)


def test_deferred_padded_lanes():
    """Padded (-1) positions must stay invisible and unwritten."""
    llm, params, kv0 = _mk()
    S, tq = 2, 4
    rng = np.random.default_rng(1)
    tok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, tq)), jnp.int32)
    pos = jnp.asarray([[0, 1, 2, 3], [0, 1, -1, -1]], jnp.int32)
    li, kvi = _run(llm, params, kv0, tok, pos, "inline")
    ld, kvd = _run(llm, params, kv0, tok, pos, "deferred")
    # padded lanes produce garbage logits; compare only real lanes
    np.testing.assert_allclose(ld[0], li[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ld[1, :2], li[1, :2], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(kvd.mask), np.asarray(kvi.mask))
    np.testing.assert_array_equal(np.asarray(kvd.k), np.asarray(kvi.k))


def test_deferred_decode_scan_equivalence():
    """Greedy decode tokens identical across kv_update modes."""
    from powerserve_tpu.engine.loops import decode_scan, prefill_step

    llm, params, kv0 = _mk(S=1)
    rng = np.random.default_rng(2)
    ptok = jnp.asarray(rng.integers(0, llm.vocab_size, (1, 8)), jnp.int32)
    ppos = jnp.arange(8, dtype=jnp.int32)[None, :]
    toks = {}
    for mode in ("inline", "deferred"):
        kv = jax.tree.map(jnp.copy, kv0)
        logits, kv = prefill_step(params, ptok, ppos, kv, llm, "xla", mode)
        cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        t, kv = decode_scan(params, cur, kv, llm, 12, "xla", mode)
        toks[mode] = np.asarray(t)
    np.testing.assert_array_equal(toks["deferred"], toks["inline"])


@pytest.mark.parametrize("S", [1, 3])
def test_window_decode_scan_equivalence(S):
    """kv_update='window' loop (cache loop-invariant, one post-scan
    commit) produces identical tokens AND identical final cache state
    to the legacy carry loop."""
    from powerserve_tpu.engine.loops import decode_scan, prefill_step

    llm, params, kv0 = _mk(S=S)
    rng = np.random.default_rng(7)
    ptok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, 8)), jnp.int32)
    ppos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
    out = {}
    for loop in ("carry", "window"):
        kv = jax.tree.map(jnp.copy, kv0)
        logits, kv = prefill_step(params, ptok, ppos, kv, llm, "xla", None)
        cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        t, kv = decode_scan(params, cur, kv, llm, 12, "xla", loop=loop)
        out[loop] = (np.asarray(t), kv)
    tc, kvc = out["carry"]
    tw, kvw = out["window"]
    np.testing.assert_array_equal(tw, tc)
    np.testing.assert_array_equal(np.asarray(kvw.mask), np.asarray(kvc.mask))
    np.testing.assert_array_equal(np.asarray(kvw.pos), np.asarray(kvc.pos))
    # int8 cache values may differ by 1 ulp on a tiny fraction of
    # elements: the two loops merge softmax partitions in a different
    # order, and a float K/V value sitting on a quantization tie can
    # round either way downstream of that
    for a, b in ((kvw.k, kvc.k), (kvw.v, kvc.v)):
        d = np.abs(np.asarray(a).astype(np.int32)
                   - np.asarray(b).astype(np.int32))
        assert d.max() <= 1 and (d != 0).mean() < 1e-3
    np.testing.assert_allclose(np.asarray(kvw.k_scale),
                               np.asarray(kvc.k_scale), rtol=1e-3)
    # the committed cache must be USABLE: continue decoding from it with
    # the other loop and stay token-identical
    t2w, _ = decode_scan(params, jnp.asarray(tw[:, -1]), kvw, llm, 4,
                         "xla", loop="carry")
    t2c, _ = decode_scan(params, jnp.asarray(tc[:, -1]), kvc, llm, 4,
                         "xla", loop="window")
    np.testing.assert_array_equal(np.asarray(t2w), np.asarray(t2c))


def test_deferred_attention_chunked_matches_dense():
    """The long-context merge (cache streamed + in-flight block) agrees
    with the dense concat path."""
    rng = np.random.default_rng(3)
    S, Tq, H, Hkv, D, T = 2, 3, 4, 2, 8, 32
    q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 127, (S, Hkv, T, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 127, (S, Hkv, T, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, T)), jnp.float32)
    kn = jnp.asarray(rng.integers(-127, 127, (S, Hkv, Tq, D)), jnp.int8)
    vn = jnp.asarray(rng.integers(-127, 127, (S, Hkv, Tq, D)), jnp.int8)
    kns = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, Tq)), jnp.float32)
    vns = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, Tq)), jnp.float32)
    mask = jnp.asarray(rng.random((S, T)) > 0.3)
    qi = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tq), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tq), 1)
    intra = jnp.broadcast_to(ji <= qi, (S, Tq, Tq))
    dense = gqa_attention_quant_deferred(q, kq, ks, vq, vs, mask, kn, kns,
                                         vn, vns, intra, 0.125, chunk=64)
    chunked = gqa_attention_quant_deferred(q, kq, ks, vq, vs, mask, kn, kns,
                                           vn, vns, intra, 0.125, chunk=8)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_deferred_matches_inline_long_cache():
    """Deferred forward at T past the attention chunk size (streams the
    cache then merges the in-flight block)."""
    llm, params, kv0 = _mk(S=1, T=48)
    rng = np.random.default_rng(4)
    ptok = jnp.asarray(rng.integers(0, llm.vocab_size, (1, 40)), jnp.int32)
    ppos = jnp.arange(40, dtype=jnp.int32)[None, :]
    _, kv = forward(params, llm, kv0, ptok, ppos, backend="xla",
                    logits_mode="none")
    tok = jnp.asarray(rng.integers(0, llm.vocab_size, (1, 1)), jnp.int32)
    pos = jnp.full((1, 1), 40, jnp.int32)
    import powerserve_tpu.ops.attention as A

    li, _ = _run(llm, params, kv, tok, pos, "inline")
    # shrink the chunk threshold so T=48 takes the streaming path
    orig = A.gqa_attention_quant_deferred

    def small_chunk(*a, **kw):
        kw["chunk"] = 16
        return orig(*a, **kw)

    A.gqa_attention_quant_deferred = small_chunk
    import powerserve_tpu.models.llama as L

    L.gqa_attention_quant_deferred = small_chunk
    try:
        ld, _ = _run(llm, params, kv, tok, pos, "deferred")
    finally:
        A.gqa_attention_quant_deferred = orig
        L.gqa_attention_quant_deferred = orig
    np.testing.assert_allclose(ld, li, rtol=2e-4, atol=2e-4)
