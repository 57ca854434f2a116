"""Sharding tests on the virtual 8-device CPU mesh: sharded forward
equals single-device forward; KV/params get the intended shardings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from powerserve_tpu.kv import KVCache
from powerserve_tpu.models.llama import forward
from powerserve_tpu.parallel import make_mesh, shard_kv, shard_params
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS

PRESETS.setdefault("ptest", dict(dim=256, ffn=512, layers=2, heads=8,
                                 kv_heads=8, vocab=512, arch="llama",
                                 bias=False))


@pytest.fixture(scope="module")
def model():
    cfg, params = make_device_params("ptest", quant="q4_k")
    return cfg, params


def _run(params, cfg, kv, mesh=None):
    tokens = jnp.asarray([[3, 5, 7, 9]])
    tokens = jnp.broadcast_to(tokens, (kv.n_slots, 4))
    pos = jnp.broadcast_to(jnp.arange(4)[None, :], (kv.n_slots, 4))

    @jax.jit
    def step(params, kv):
        return forward(params, cfg.llm, kv, tokens, pos, backend="xla",
                       logits_mode="last")

    if mesh is not None:
        with mesh:
            logits, kv = step(params, kv)
    else:
        logits, kv = step(params, kv)
    return np.asarray(logits), kv


def test_sharded_forward_matches_single(model):
    cfg, params = model
    llm = cfg.llm
    kv0 = KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads, llm.head_size)
    ref, _ = _run(params, cfg, kv0)

    mesh = make_mesh({"dp": 2, "tp": 4})
    p2 = shard_params(params, mesh)
    kv2 = shard_kv(KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads,
                                  llm.head_size), mesh)
    got, kv2 = _run(p2, cfg, kv2, mesh)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_shardings_applied(model):
    cfg, params = model
    mesh = make_mesh({"dp": 2, "tp": 4})
    p2 = shard_params(params, mesh)
    # column-parallel fused qkv: last axis sharded over tp
    lw = p2.layers
    spec = lw.wqkv.q.sharding.spec
    assert spec[-1] == "tp", spec
    # row-parallel down proj: K axis sharded
    spec = lw.w_down.q.sharding.spec
    assert spec[-2] == "tp", spec
    llm = cfg.llm
    kv = shard_kv(KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads,
                                 llm.head_size), mesh)
    # [L, S, H, T, D]: heads axis 2 over tp, slots axis 1 over dp
    assert kv.k.sharding.spec[2] == "tp"
    assert kv.k.sharding.spec[1] == "dp"


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.shape["tp"] == len(jax.devices())
    assert mesh.shape["dp"] == 1


def test_sequence_parallel_forward_matches_single(model):
    """sp shards the KV time axis: a dp*sp*tp mesh must reproduce the
    single-device logits (GSPMD partial-softmax + shard-local scatters),
    including a second step whose queries attend to step-1 entries that
    live on a different sp shard."""
    cfg, params = model
    llm = cfg.llm
    kv0 = KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads, llm.head_size)
    ref1, kv0 = _run(params, cfg, kv0)  # forward advances kv itself
    ref2, _ = _run2(params, cfg, kv0)

    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
    p2 = shard_params(params, mesh)
    kv2 = shard_kv(KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads,
                                  llm.head_size), mesh)
    assert kv2.k.sharding.spec[3] == "sp", kv2.k.sharding.spec
    assert kv2.mask.sharding.spec[1] == "sp"
    got1, kv2 = _run(p2, cfg, kv2, mesh)
    got2, _ = _run2(p2, cfg, kv2, mesh)
    np.testing.assert_allclose(got1, ref1, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(got2, ref2, rtol=3e-2, atol=3e-2)


def _run2(params, cfg, kv, mesh=None):
    """Second-step queries (positions 4..11, crossing the sp=2 shard
    boundary of a T=16 cache)."""
    tokens = jnp.broadcast_to(jnp.asarray([[2, 4, 6, 8, 1, 3, 5, 7]]),
                              (kv.n_slots, 8))
    pos = jnp.broadcast_to(4 + jnp.arange(8)[None, :], (kv.n_slots, 8))

    @jax.jit
    def step(params, kv):
        return forward(params, cfg.llm, kv, tokens, pos, backend="xla",
                       logits_mode="last")

    if mesh is not None:
        with mesh:
            logits, kv = step(params, kv)
    else:
        logits, kv = step(params, kv)
    return np.asarray(logits), kv


# ---------------------------------------------------------------------------
# shard_map tensor-parallel path (parallel/tp.py) — the multichip path
# that can run the Pallas kernel on local shards
# ---------------------------------------------------------------------------

PRESETS.setdefault("tptest", dict(dim=1024, ffn=2048, layers=2, heads=8,
                                  kv_heads=8, vocab=1024, arch="llama",
                                  bias=False))


@pytest.fixture(scope="module")
def tp_model():
    cfg, params = make_device_params("tptest", quant="q4_k")
    return cfg, params


@pytest.fixture(scope="module")
def tp_ref(tp_model):
    cfg, params = tp_model
    llm = cfg.llm
    kv0 = KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads, llm.head_size)
    tokens = jnp.broadcast_to(jnp.asarray([[3, 5, 7, 9]]), (4, 4))
    pos = jnp.broadcast_to(jnp.arange(4)[None, :], (4, 4))
    logits, kv = jax.jit(lambda p, kv: forward(
        p, llm, kv, tokens, pos, backend="xla", logits_mode="last"))(
            params, kv0)
    return np.asarray(logits), kv, tokens, pos


def _tp_setup(cfg, params, mesh):
    from powerserve_tpu.parallel.tp import shard_kv_tp, shard_params_tp

    llm = cfg.llm
    p2 = shard_params_tp(params, mesh, llm)
    kv2 = shard_kv_tp(
        KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads, llm.head_size),
        mesh)
    return p2, kv2


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
def test_tp_forward_matches_single(tp_model, tp_ref, backend):
    from powerserve_tpu.parallel.tp import tp_forward

    cfg, params = tp_model
    ref, _, tokens, pos = tp_ref
    mesh = make_mesh({"dp": 2, "tp": 4})
    p2, kv2 = _tp_setup(cfg, params, mesh)
    got, _ = jax.jit(lambda p, kv: tp_forward(
        p, cfg.llm, kv, tokens, pos, mesh=mesh, backend=backend))(p2, kv2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-2, atol=3e-2)


def test_tp_sp_forward_and_decode_match_single(tp_model, tp_ref):
    """Explicit shard_map path with BOTH tensor and sequence
    parallelism (dp=2, sp=2, tp=2): per-shard partial softmax + merge
    collectives must reproduce the single-device logits, and decode
    steps crossing the sp shard boundary (T=16 -> 8/shard) must keep
    emitting the same greedy tokens."""
    from powerserve_tpu.engine.loops import decode_scan
    from powerserve_tpu.parallel.tp import tp_decode_scan, tp_forward

    cfg, params = tp_model
    llm = cfg.llm
    ref, kv_ref, tokens, pos = tp_ref
    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
    p2, kv2 = _tp_setup(cfg, params, mesh)
    got, kv2 = jax.jit(lambda p, kv: tp_forward(
        p, llm, kv, tokens, pos, mesh=mesh, backend="xla"))(p2, kv2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-2, atol=3e-2)
    # 7 decode steps take pos 4 -> 11, crossing the shard-0/1 boundary
    t0 = jnp.argmax(jnp.asarray(ref), axis=-1).astype(jnp.int32)
    # decode_scan donates its kv: hand it a copy, kv_ref is shared
    toks_ref, _ = decode_scan(params, t0, jax.tree.map(jnp.copy, kv_ref),
                              llm, 7, "xla")
    toks_sp, _ = tp_decode_scan(p2, t0, kv2, llm, 7, mesh, "xla")
    assert np.array_equal(np.asarray(toks_ref), np.asarray(toks_sp))


def test_tp_decode_scan_matches_single(tp_model, tp_ref):
    from powerserve_tpu.engine.loops import decode_scan
    from powerserve_tpu.parallel.tp import tp_decode_scan, tp_forward

    cfg, params = tp_model
    llm = cfg.llm
    ref, kv_ref, tokens, pos = tp_ref
    mesh = make_mesh({"dp": 2, "tp": 4})
    p2, kv2 = _tp_setup(cfg, params, mesh)
    _, kv2 = jax.jit(lambda p, kv: tp_forward(
        p, llm, kv, tokens, pos, mesh=mesh, backend="xla"))(p2, kv2)
    t0 = jnp.argmax(jnp.asarray(ref), axis=-1).astype(jnp.int32)
    toks_ref, _ = decode_scan(params, t0, kv_ref, llm, 5, "xla")
    toks_tp, _ = tp_decode_scan(p2, t0, kv2, llm, 5, mesh, "xla")
    assert np.array_equal(np.asarray(toks_ref), np.asarray(toks_tp))


def test_tp_prepare_repacks_row_parallel(tp_model):
    from powerserve_tpu.parallel.tp import prepare_params_for_tp

    cfg, params = tp_model
    p2 = prepare_params_for_tp(params, cfg.llm, 4)
    down = p2.layers.w_down
    if down is not None and down.packed:
        assert (down.in_features // 4) % down.pack_group == 0


def test_paged_sharded_forward_matches_single(model):
    """Paged pool under GSPMD: kv heads shard over tp, page table
    replicates; sharded forward equals single-device paged forward."""
    from powerserve_tpu.kv.paged import PagedKVCache, PagePool

    cfg, params = model
    llm = cfg.llm

    def mk():
        kv = PagedKVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads,
                                 llm.head_size, n_pages=9, page_size=8)
        pool = PagePool(9, 4, kv.max_pages, 8)
        for s in range(4):
            assert pool.ensure(s, 16)
        return pool.flush(kv)

    ref, _ = _run(params, cfg, mk())

    mesh = make_mesh({"dp": 2, "tp": 4})
    p2 = shard_params(params, mesh)
    kv2 = shard_kv(mk(), mesh)
    got, kv2 = _run(p2, cfg, kv2, mesh)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999
    # the intended shardings actually applied
    ks = kv2.k.sharding.spec
    assert ks[2] == "tp" and ks[1] is None


def test_tp_collective_audit_hlo():
    """tools/check_overlap: AOT-compile the tp decode step for a real
    v5e:2x2 TPU topology and audit the optimized HLO's collectives
    (VERDICT r3 item 5). Asserts the expected structure: exactly 2
    psums per layer inside the scan body, KB-scale payloads, and a
    collective fraction small enough that the >=85% scaling claim
    holds without async overlap. Skips where the TPU topology
    compiler is unavailable (CPU-only CI)."""
    import io
    import json
    import sys

    import pytest

    try:
        from jax.experimental import topologies
        topologies.get_topology_desc(platform="tpu",
                                     topology_name="v5e:2x2")
    except Exception:
        pytest.skip("TPU topology compiler unavailable")

    from powerserve_tpu.tools import check_overlap

    argv, out = sys.argv, io.StringIO()
    sys.argv = ["check_overlap", "--preset", "tiny"]
    try:
        sys.stdout, saved = out, sys.stdout
        try:
            check_overlap.main()
        finally:
            sys.stdout = saved
    finally:
        sys.argv = argv
    audit = json.loads(out.getvalue())
    assert audit["per_layer_collectives"] == 2  # wo-psum + down-psum
    per_layer = [c for c in audit["collectives"] if c["in_layer_scan"]]
    assert all(c["kind"].startswith("all-reduce") for c in per_layer)
    assert all(c["bytes"] <= 65536 for c in per_layer)  # KB-scale
    assert audit["collective_fraction"] < 0.15
