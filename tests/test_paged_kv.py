"""Paged KV pool semantics + forward equivalence vs the dense cache.

The paged pool (kv/paged.py) must be numerically indistinguishable from
the dense KVCache: same int8 quantization, same mask/pos semantics, and
forward() logits identical — the only difference is where K/V bytes
live (shared pool pages through a page table vs per-slot slabs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.kv.paged import PagedKVCache, PagePool
from powerserve_tpu.models.llama import forward
from powerserve_tpu.tools.bench_params import make_device_params


def _mk_pair(slots=2, T=32, layers=2, heads=2, dim=4, page=8, n_pages=16):
    dense = KVCache.create(layers, slots, T, heads, dim, dtype="int8")
    paged = PagedKVCache.create(layers, slots, T, heads, dim,
                                n_pages=n_pages, page_size=page)
    # deliberately scrambled page assignment: indirection must not
    # depend on pages being contiguous or ordered
    table = np.full((slots, paged.max_pages), n_pages, np.int32)
    perm = np.random.default_rng(7).permutation(n_pages)
    mp = paged.max_pages
    for s in range(slots):
        table[s] = perm[s * mp:(s + 1) * mp]
    return dense, paged.assign_pages(table)


def _append_both(dense, paged, vals_k, vals_v, pos):
    for layer in range(dense.n_layers):
        dense = dense.append(layer, vals_k, vals_v, pos)
        paged = paged.append(layer, vals_k, vals_v, pos)
    return dense.advance(pos), paged.advance(pos)


def _dense_view(paged):
    """Gather each layer's slabs to the dense [L, S, H, T, D] layout."""
    k = jnp.stack([paged.gather_slab(paged.k[i])
                   for i in range(paged.n_layers)])
    ks = jnp.stack([paged.gather_slab(paged.k_scale[i])
                    for i in range(paged.n_layers)])
    v = jnp.stack([paged.gather_slab(paged.v[i])
                   for i in range(paged.n_layers)])
    vs = jnp.stack([paged.gather_slab(paged.v_scale[i])
                    for i in range(paged.n_layers)])
    return k, ks, v, vs


def test_paged_append_matches_dense():
    rng = np.random.default_rng(0)
    dense, paged = _mk_pair()
    S, Tn = 2, 12
    vk = jnp.asarray(rng.standard_normal((S, Tn, 2, 4)), jnp.float32)
    vv = jnp.asarray(rng.standard_normal((S, Tn, 2, 4)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(Tn)[None, :], (S, Tn))
    dense, paged = _append_both(dense, paged, vk, vv, pos)

    k, ks, v, vs = _dense_view(paged)
    m = np.asarray(dense.mask)
    np.testing.assert_array_equal(np.asarray(paged.mask), m)
    np.testing.assert_array_equal(np.asarray(paged.pos),
                                  np.asarray(dense.pos))
    # stored positions agree exactly (same quantizer)
    np.testing.assert_array_equal(np.asarray(k)[:, :, :, :Tn],
                                  np.asarray(dense.k)[:, :, :, :Tn])
    np.testing.assert_array_equal(np.asarray(v)[:, :, :, :Tn],
                                  np.asarray(dense.v)[:, :, :, :Tn])
    np.testing.assert_array_equal(np.asarray(ks)[:, :, :, :Tn],
                                  np.asarray(dense.k_scale)[:, :, :, :Tn])


def test_paged_oob_and_unallocated_dropped():
    """Positions beyond capacity or without an allocated page must not
    write anywhere (mirrors the dense cache's mode='drop' semantics)."""
    dense, paged = _mk_pair()
    # deallocate slot 1's last pages: logical positions >= 8 unallocated
    table = np.asarray(paged.page_table).copy()
    table[1, 1:] = paged.n_pages
    paged = paged.assign_pages(table)
    before = np.asarray(paged.k).copy()
    vk = jnp.ones((2, 3, 2, 4), jnp.float32)
    pos = jnp.asarray([[40, -1, 2], [10, 20, 2]])  # 40 OOB; 10/20 unalloc
    paged = paged.append(0, vk, vk, pos)
    after = np.asarray(paged.k)
    # only the two legal writes (slot0 pos2, slot1 pos2) changed anything
    changed = np.argwhere((after != before).any(axis=(2, 3, 4))[0])
    legal_pages = {int(table[0, 0]), int(table[1, 0])}
    assert {int(c[0]) for c in changed} <= legal_pages


def test_paged_mask_ops_match_dense():
    dense, paged = _mk_pair()
    pos = jnp.broadcast_to(jnp.arange(10)[None, :], (2, 10))
    dense, paged = dense.advance(pos), paged.advance(pos)
    for op in (lambda c: c.rollback(3, active=jnp.array([True, False])),
               lambda c: c.truncate(4),
               lambda c: c.set_mask(0, jnp.array([1, 2]), False),
               lambda c: c.reset_slot(1)):
        dense, paged = op(dense), op(paged)
        np.testing.assert_array_equal(np.asarray(paged.mask),
                                      np.asarray(dense.mask))
        np.testing.assert_array_equal(np.asarray(paged.pos),
                                      np.asarray(dense.pos))


def test_paged_gather_commit_tokens():
    """Tree-verify compaction across page boundaries."""
    rng = np.random.default_rng(1)
    dense, paged = _mk_pair(page=4)
    S, Tn = 2, 14
    vk = jnp.asarray(rng.standard_normal((S, Tn, 2, 4)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(Tn)[None, :], (S, Tn))
    for layer in range(2):
        dense = dense.append(layer, vk, vk, pos)
        paged = paged.append(layer, vk, vk, pos)
    dense = dense.advance(pos[:, :8])  # 8 committed, 6 transient
    paged = paged.advance(pos[:, :8])
    # accept transient entries at positions [9, 12, 13] / [8, 10, -1]
    src = jnp.asarray([[9, 12, 13], [8, 10, -1]])
    n_acc = jnp.asarray([3, 2])
    dense = dense.commit_tokens(jnp.arange(2), src, n_acc)
    paged = paged.commit_tokens(jnp.arange(2), src, n_acc)
    k, ks, _, _ = _dense_view(paged)
    np.testing.assert_array_equal(np.asarray(paged.pos),
                                  np.asarray(dense.pos))
    np.testing.assert_array_equal(np.asarray(paged.mask),
                                  np.asarray(dense.mask))
    np.testing.assert_array_equal(np.asarray(k)[:, :, :, :12],
                                  np.asarray(dense.k)[:, :, :, :12])
    np.testing.assert_array_equal(np.asarray(ks)[:, :, :, :12],
                                  np.asarray(dense.k_scale)[:, :, :, :12])


def test_paged_prefix_snapshot_roundtrip():
    """save_slot_prefix produces the dense snapshot format; restoring
    into another paged cache (different page assignment) reproduces it."""
    rng = np.random.default_rng(2)
    dense, paged = _mk_pair(page=4)
    S, Tn = 2, 10
    vk = jnp.asarray(rng.standard_normal((S, Tn, 2, 4)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(Tn)[None, :], (S, Tn))
    dense, paged = _append_both(dense, paged, vk, vk, pos)

    sd = dense.save_slot_prefix(0, 7)
    sp = paged.save_slot_prefix(0, 7)
    np.testing.assert_array_equal(np.asarray(sp["k"]), np.asarray(sd["k"]))
    np.testing.assert_array_equal(np.asarray(sp["k_scale"]),
                                  np.asarray(sd["k_scale"]))

    # restore into slot 1 of a fresh paged cache with a different table
    _, fresh = _mk_pair(page=4)
    fresh = fresh.restore_slot_prefix(1, sp)
    k, ks, _, _ = _dense_view(fresh)
    np.testing.assert_array_equal(np.asarray(k)[:, 1, :, :7],
                                  np.asarray(sd["k"])[:, :, :7])
    assert np.asarray(fresh.pos).tolist() == [0, 7]
    assert np.asarray(fresh.mask)[1, :7].all()
    assert not np.asarray(fresh.mask)[1, 7:].any()


@pytest.mark.parametrize("tq", [1, 4])
def test_paged_forward_matches_dense(tq):
    """forward() logits identical on paged vs dense caches."""
    cfg, params = make_device_params("tiny", "q8_0", stacked=True)
    llm = cfg.llm
    S, T = 2, 64
    dense = KVCache.create(llm.n_layers, S, T, llm.n_kv_heads,
                           llm.head_size, dtype="int8")
    paged = PagedKVCache.create(llm.n_layers, S, T, llm.n_kv_heads,
                                llm.head_size, n_pages=2 * (T // 16) + 1,
                                page_size=16)
    pool = PagePool(paged.n_pages, S, paged.max_pages, 16)
    assert pool.ensure(0, T) and pool.ensure(1, T - 16)
    paged = pool.flush(paged)

    rng = np.random.default_rng(3)
    ptok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, 8)), jnp.int32)
    ppos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
    _, dense = forward(params, llm, dense, ptok, ppos, backend="xla",
                       logits_mode="none")
    _, paged = forward(params, llm, paged, ptok, ppos, backend="xla",
                       logits_mode="none")

    tok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, tq)), jnp.int32)
    pos = 8 + jnp.broadcast_to(jnp.arange(tq, dtype=jnp.int32), (S, tq))
    ld, dense = forward(params, llm, dense, tok, pos, backend="xla",
                        logits_mode="all")
    lp, paged = forward(params, llm, paged, tok, pos, backend="xla",
                        logits_mode="all")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(paged.mask),
                                  np.asarray(dense.mask))
    np.testing.assert_array_equal(np.asarray(paged.pos),
                                  np.asarray(dense.pos))


def test_page_pool_oversubscription():
    pool = PagePool(n_pages=6, n_slots=3, max_pages=4, page_size=8)
    assert pool.ensure(0, 24)  # 3 pages
    assert pool.ensure(1, 17)  # 3 pages (ceil)
    assert pool.n_free == 0
    assert not pool.ensure(2, 1)  # exhausted
    assert pool.ensure(0, 24)  # already covered: no-op success
    pool.release(0)
    assert pool.n_free == 3
    assert pool.ensure(2, 8)
    # logical range cap
    assert not pool.ensure(2, 8 * 5)
    # table mirror matches ownership
    assert set(pool.table[1][:3].tolist()) == set(pool.owned[1])
    assert (pool.table[0] == 6).all()


def test_flash_decode_paged_matches_xla_gather():
    """The paged Pallas decode kernel (page-table scalar prefetch) must
    match scale-folded XLA attention over the gathered dense view."""
    from powerserve_tpu.ops.attention import gqa_attention_quant
    from powerserve_tpu.ops.flash_decode import flash_decode_paged

    rng = np.random.default_rng(5)
    S, Tq, H, Hkv, D = 2, 1, 4, 2, 128
    page, MP, P = 16, 8, 2 * 8 + 3  # T_logical = 128
    T = MP * page
    kp = jnp.asarray(rng.integers(-127, 128, (P, Hkv, page, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (P, Hkv, page, D)), jnp.int8)
    ksp = jnp.asarray(rng.uniform(0.005, 0.02, (P, Hkv, page)), jnp.float32)
    vsp = jnp.asarray(rng.uniform(0.005, 0.02, (P, Hkv, page)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
    # scrambled tables; slot 1's tail pages unallocated (== P)
    table = np.full((S, MP), P, np.int32)
    perm = rng.permutation(P - 3)
    table[0] = perm[:MP]
    table[1, :5] = perm[MP:MP + 5]
    # visibility covers only stored positions (and none of the
    # unallocated pages)
    vis = np.zeros((S, Tq, T), bool)
    vis[0, :, :100] = True
    vis[1, :, : 5 * page - 7] = True
    vis = jnp.asarray(vis)
    pt = jnp.asarray(table)

    out_k = flash_decode_paged(q, kp, ksp, vp, vsp, pt, vis, 0.088,
                               page_size=page, interpret=True)

    from powerserve_tpu.kv.paged import PagedKVCache
    pc = PagedKVCache(k=kp[None], v=vp[None], k_scale=ksp[None],
                      v_scale=vsp[None], page_table=pt,
                      mask=vis[:, 0, :], pos=jnp.zeros(S, jnp.int32),
                      page_size=page)
    out_x = gqa_attention_quant(
        q, pc.gather_slab(kp), pc.gather_slab(ksp),
        pc.gather_slab(vp), pc.gather_slab(vsp), vis, 0.088,
        backend="xla")
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=2e-2, atol=2e-3)


def test_paged_forward_flash_routing():
    """Decode at T >= 2048 routes the paged branch to the Pallas kernel
    (interpret mode here); logits must match the XLA gather path."""
    cfg, params = make_device_params("tiny", "q8_0", stacked=True)
    llm = cfg.llm
    S, T, page = 1, 2048, 64
    paged = PagedKVCache.create(llm.n_layers, S, T, llm.n_kv_heads,
                                llm.head_size, n_pages=33, page_size=page)
    pool = PagePool(33, S, paged.max_pages, page)
    assert pool.ensure(0, T)
    paged = pool.flush(paged)
    rng = np.random.default_rng(6)
    ptok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, 8)), jnp.int32)
    ppos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
    _, paged = forward(params, llm, paged, ptok, ppos, backend="xla",
                       logits_mode="none")
    tok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, 1)), jnp.int32)
    pos = jnp.full((S, 1), 8, jnp.int32)
    lx, _ = forward(params, llm, paged, tok, pos, backend="xla",
                    logits_mode="last")
    lk, _ = forward(params, llm, paged, tok, pos,
                    backend="pallas_interpret", logits_mode="last")
    # backend= also flips the QMATMUL path (pallas interpret vs XLA), so
    # bf16 rounding differs beyond attention — the tight attention-only
    # equivalence is test_flash_decode_paged_matches_xla_gather above
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lx),
                               rtol=3e-2, atol=3e-1)
    assert int(np.argmax(lk)) == int(np.argmax(lx))


def test_flash_decode_paged_deferred_matches_xla():
    """State-mode kernel + XLA in-flight merge == the XLA deferred
    reference (gathered dense view + gqa_attention_quant_deferred):
    validates forward()'s paged deferred-KV decode path, which defers
    every pool scatter to one post-scan commit."""
    from powerserve_tpu.ops.attention import gqa_attention_quant_deferred
    from powerserve_tpu.ops.flash_decode import flash_decode_paged_deferred

    rng = np.random.default_rng(11)
    S, Tq, H, Hkv, D = 2, 1, 4, 2, 128
    page, MP, P = 16, 8, 2 * 8 + 3
    T = MP * page
    kp = jnp.asarray(rng.integers(-127, 128, (P, Hkv, page, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (P, Hkv, page, D)), jnp.int8)
    ksp = jnp.asarray(rng.uniform(0.005, 0.02, (P, Hkv, page)), jnp.float32)
    vsp = jnp.asarray(rng.uniform(0.005, 0.02, (P, Hkv, page)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
    knq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, Tq, D)), jnp.int8)
    vnq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, Tq, D)), jnp.int8)
    kns = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, Tq)), jnp.float32)
    vns = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, Tq)), jnp.float32)
    intra = jnp.ones((S, Tq, Tq), bool)
    table = np.full((S, MP), P, np.int32)
    perm = rng.permutation(P - 3)
    table[0] = perm[:MP]
    table[1, :5] = perm[MP:MP + 5]
    mask = np.zeros((S, T), bool)
    mask[0, :100] = True
    mask[1, : 5 * page - 7] = True
    mask = jnp.asarray(mask)
    pt = jnp.asarray(table)
    vis_c = jnp.broadcast_to(mask[:, None, :], (S, Tq, T))

    got = flash_decode_paged_deferred(
        q, kp, ksp, vp, vsp, pt, vis_c, knq, kns, vnq, vns, intra,
        0.088, page_size=page, interpret=True)

    pc = PagedKVCache(k=kp[None], v=vp[None], k_scale=ksp[None],
                      v_scale=vsp[None], page_table=pt, mask=mask,
                      pos=jnp.zeros(S, jnp.int32), page_size=page)
    ref = gqa_attention_quant_deferred(
        q, pc.gather_slab(kp), pc.gather_slab(ksp), pc.gather_slab(vp),
        pc.gather_slab(vsp), mask, knq, kns, vnq, vns, intra, 0.088)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)


def test_flash_decode_paged_deferred_empty_cache():
    """A slot with NO committed pages (fresh admission) must reduce to
    attention over the in-flight block alone — the merge's m=-inf guard."""
    from powerserve_tpu.ops.attention import gqa_attention_quant_deferred
    from powerserve_tpu.ops.flash_decode import flash_decode_paged_deferred

    rng = np.random.default_rng(12)
    S, Tq, H, Hkv, D = 1, 1, 4, 2, 128
    page, MP, P = 16, 4, 6
    T = MP * page
    kp = jnp.zeros((P, Hkv, page, D), jnp.int8)
    vp = jnp.zeros((P, Hkv, page, D), jnp.int8)
    ksp = jnp.zeros((P, Hkv, page), jnp.float32)
    vsp = jnp.zeros((P, Hkv, page), jnp.float32)
    q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
    knq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, Tq, D)), jnp.int8)
    vnq = jnp.asarray(rng.integers(-127, 128, (S, Hkv, Tq, D)), jnp.int8)
    kns = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, Tq)), jnp.float32)
    vns = jnp.asarray(rng.uniform(0.005, 0.02, (S, Hkv, Tq)), jnp.float32)
    intra = jnp.ones((S, Tq, Tq), bool)
    pt = jnp.full((S, MP), P, jnp.int32)  # nothing allocated
    mask = jnp.zeros((S, T), bool)
    vis_c = jnp.broadcast_to(mask[:, None, :], (S, Tq, T))

    got = flash_decode_paged_deferred(
        q, kp, ksp, vp, vsp, pt, vis_c, knq, kns, vnq, vns, intra,
        0.088, page_size=page, interpret=True)
    ref = gqa_attention_quant_deferred(
        q, jnp.zeros((S, Hkv, T, D), jnp.int8),
        jnp.zeros((S, Hkv, T), jnp.float32),
        jnp.zeros((S, Hkv, T, D), jnp.int8),
        jnp.zeros((S, Hkv, T), jnp.float32), mask,
        knq, kns, vnq, vns, intra, 0.088)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("S", [1, 2])
def test_paged_window_decode_scan_matches_carry(S):
    """decode_scan's window loop on a PAGED pool (pool slabs stay
    loop-invariant; ONE post-scan commit scatters every lane through
    the page table) emits the same greedy tokens and leaves the same
    logical cache state as the legacy carry loop."""
    from powerserve_tpu.engine.loops import decode_scan, prefill_step

    cfg, params = make_device_params("tiny", "q8_0", stacked=True)
    llm = cfg.llm
    T, page = 64, 16
    rng = np.random.default_rng(11)
    ptok = jnp.asarray(rng.integers(0, llm.vocab_size, (S, 8)), jnp.int32)
    ppos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
    out = {}
    for loop in ("carry", "window"):
        paged = PagedKVCache.create(llm.n_layers, S, T, llm.n_kv_heads,
                                    llm.head_size,
                                    n_pages=S * (T // page) + 1,
                                    page_size=page)
        pool = PagePool(paged.n_pages, S, paged.max_pages, page)
        for s in range(S):
            assert pool.ensure(s, T)
        paged = pool.flush(paged)
        logits, paged = prefill_step(params, ptok, ppos, paged, llm,
                                     "xla", None)
        cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        t, paged = decode_scan(params, cur, paged, llm, 12, "xla",
                               loop=loop)
        out[loop] = (np.asarray(t), paged)
    tc, kvc = out["carry"]
    tw, kvw = out["window"]
    np.testing.assert_array_equal(tw, tc)
    np.testing.assert_array_equal(np.asarray(kvw.mask), np.asarray(kvc.mask))
    np.testing.assert_array_equal(np.asarray(kvw.pos), np.asarray(kvc.pos))
    # pool slabs: same values modulo the 1-ulp quantization ties the
    # dense window test documents (different softmax partition order)
    for a, b in ((kvw.k, kvc.k), (kvw.v, kvc.v)):
        d = np.abs(np.asarray(a).astype(np.int32)
                   - np.asarray(b).astype(np.int32))
        assert d.max() <= 1 and (d != 0).mean() < 1e-3
    # the committed pool must be USABLE: continue with the other loop
    t2w, _ = decode_scan(params, jnp.asarray(tw[:, -1]), kvw, llm, 4,
                         "xla", loop="carry")
    t2c, _ = decode_scan(params, jnp.asarray(tc[:, -1]), kvc, llm, 4,
                         "xla", loop="window")
    np.testing.assert_array_equal(np.asarray(t2w), np.asarray(t2c))
