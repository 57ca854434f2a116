"""shard_map tensor-parallel SERVING tests: BatchScheduler(tp_mesh=...)
must reproduce single-device scheduler output for plain decode,
speculation, multimodal prefill, and the paged pool — the fused-kernel
multichip path (parallel/tp.py) wired into continuous batching (the
GSPMD `mesh` path falls back to backend="xla"; this one keeps Pallas).
Reference capability: single-device serving only (SURVEY §2.3) — the
scale-out x serving compositions here are net-new.
"""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.engine.scheduler import BatchScheduler, Request
from powerserve_tpu.parallel.mesh import make_mesh
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS

PRESETS.setdefault("tpserve", dict(dim=256, ffn=512, layers=2, heads=8,
                                   kv_heads=8, vocab=512, arch="llama",
                                   bias=False))


@pytest.fixture(scope="module")
def model():
    return make_device_params("tpserve", quant="q4_k")


def _run(sched, prompts, max_tokens=8, timeout=240, **req_kw):
    sched.start()
    outs, dones = [], []
    for p in prompts:
        done = threading.Event()
        out = []

        def sink(t, out=out, done=done):
            if t is None:
                done.set()
            else:
                out.append(t)

        sched.submit(Request(prompt_ids=list(p), max_tokens=max_tokens,
                             temperature=0.0, sink=sink, **req_kw))
        outs.append(out)
        dones.append(done)
    for d in dones:
        assert d.wait(timeout=timeout), "request did not finish"
    return outs


PROMPTS = [[3, 5, 7, 9, 11], [101, 7, 42]]


@pytest.fixture(scope="module")
def ref_tokens(model):
    cfg, params = model
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    s = BatchScheduler(params, cfg, hp, backend="xla")
    try:
        return _run(s, PROMPTS)
    finally:
        s.stop()


def _tp_sched(model, mesh, **kw):
    from powerserve_tpu.parallel.tp import shard_params_tp

    cfg, params = model
    p2 = shard_params_tp(params, mesh, cfg.llm)
    hp = kw.pop("hp", None) or HyperParams(max_slots=2, batch_size=8,
                                           max_seq_len=64)
    return BatchScheduler(p2, cfg, hp, backend="xla", tp_mesh=mesh, **kw), p2


def test_tp_scheduler_matches_single(model, ref_tokens):
    mesh = make_mesh({"dp": 2, "tp": 4})
    s, _ = _tp_sched(model, mesh)
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_tp_scheduler_interpret_kernel(model, ref_tokens):
    """The Pallas kernel itself (interpret mode on CPU) inside the
    serving shard_map — proves multichip serving keeps the fused
    kernel instead of the GSPMD xla fallback."""
    mesh = make_mesh({"dp": 2, "tp": 4})  # K/shard=64 keeps a pack group
    from powerserve_tpu.parallel.tp import shard_params_tp

    cfg, params = model
    p2 = shard_params_tp(params, mesh, cfg.llm)
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    s = BatchScheduler(p2, cfg, hp, backend="pallas_interpret",
                       tp_mesh=mesh)
    try:
        got = _run(s, [PROMPTS[0]], max_tokens=4)
    finally:
        s.stop()
    assert got[0] == ref_tokens[0][:4]


def test_tp_scheduler_spec_chain_matches(model, ref_tokens):
    """Greedy chain speculation under tp_mesh == vanilla greedy (the
    lossless-speculation invariant, now through the shard_map path)."""
    from powerserve_tpu.speculative.chain import self_draft_config

    cfg, params = model
    mesh = make_mesh({"dp": 2, "tp": 4})
    d_llm = self_draft_config(cfg.llm, 1)
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    from powerserve_tpu.parallel.tp import shard_params_tp

    p2 = shard_params_tp(params, mesh, cfg.llm)
    s = BatchScheduler(p2, cfg, hp, backend="xla", tp_mesh=mesh,
                       draft_params=p2, draft_llm=d_llm, spec_k=2)
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_tp_scheduler_spec_tree_matches(model, ref_tokens):
    from powerserve_tpu.speculative.chain import self_draft_config

    cfg, params = model
    mesh = make_mesh({"tp": 4, "dp": 2})
    d_llm = self_draft_config(cfg.llm, 1)
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.spec_tree = "2,2"
    from powerserve_tpu.parallel.tp import shard_params_tp

    p2 = shard_params_tp(params, mesh, cfg.llm)
    s = BatchScheduler(p2, cfg, hp, backend="xla", tp_mesh=mesh,
                       draft_params=p2, draft_llm=d_llm)
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_tp_window_decode_matches_carry(model, monkeypatch):
    """The WINDOW decode loop inside the tp shard_map tick (in-flight
    K/V in a small dp/tp-sharded carried window, cache shards loop-
    invariant, one post-scan commit) is byte-equal to the legacy
    carried-cache tp loop — including a prompt long enough that the
    second dispatch continues from window-committed state."""
    import powerserve_tpu.engine.loops as L

    def run(loop):
        monkeypatch.setattr(L, "_DECODE_LOOP_DEFAULT", loop)
        mesh = make_mesh({"dp": 2, "tp": 4})
        s, _ = _tp_sched(model, mesh)
        assert s.decode_window == (loop == "window")
        try:
            return _run(s, PROMPTS, max_tokens=10)
        finally:
            s.stop()

    assert run("window") == run("carry")


def test_tp_sp_window_decode_matches_carry(model, monkeypatch):
    """Window decode under tp x SEQUENCE parallel (sp=2): the in-flight
    window rides replicated over sp; gqa_attention_quant_sp_deferred
    counts each window lane on shard 0 only and the current block
    gates per-shard via the local position remap. Byte-equal to the
    carried-cache sp loop."""
    import powerserve_tpu.engine.loops as L

    def run(loop):
        monkeypatch.setattr(L, "_DECODE_LOOP_DEFAULT", loop)
        mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
        s, _ = _tp_sched(model, mesh)
        assert s.decode_window == (loop == "window")
        try:
            return _run(s, PROMPTS, max_tokens=10)
        finally:
            s.stop()

    assert run("window") == run("carry")


def test_tp_scheduler_mm_embeds(model, ref_tokens):
    """VLM-style embed requests under tp_mesh: feeding the REAL
    embedding rows as Request.embeds must match the plain token path."""
    cfg, params = model
    mesh = make_mesh({"dp": 2, "tp": 4})
    s, p2 = _tp_sched(model, mesh, mm_dim=cfg.llm.dim)
    try:
        embeds = np.asarray(
            params.embed.lookup(jnp.asarray([PROMPTS[0]], jnp.int32))[0],
            np.float32)
        got = _run(s, [PROMPTS[0]], embeds=embeds)
    finally:
        s.stop()
    assert got[0] == ref_tokens[0]


def test_tp_scheduler_paged(model, ref_tokens):
    import jax

    # paged pool x tp_mesh requires dp == 1: 4-device tp-only mesh
    mesh = make_mesh({"tp": 4}, devices=jax.devices()[:4])
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.paged_pages = 16
    hp.page_size = 8
    s, _ = _tp_sched(model, mesh, hp=hp)
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_tp_scheduler_paged_interpret_kernel(model, ref_tokens):
    """Paged pool + tp_mesh with the PALLAS state-mode kernel
    (interpret): the deferred paged decode path (flash state kernel +
    in-flight merge + post-scan pool commit) inside the serving
    shard_map must still match single-device greedy."""
    import jax

    mesh = make_mesh({"tp": 4}, devices=jax.devices()[:4])
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.paged_pages = 16
    hp.page_size = 8
    from powerserve_tpu.parallel.tp import shard_params_tp

    cfg, params = model
    p2 = shard_params_tp(params, mesh, cfg.llm)
    s = BatchScheduler(p2, cfg, hp, backend="pallas_interpret",
                       tp_mesh=mesh)
    try:
        got = _run(s, [PROMPTS[0]], max_tokens=4)
    finally:
        s.stop()
    assert got[0] == ref_tokens[0][:4]


def test_tp_spec_chain_factored_draft_head(model, ref_tokens):
    """Chain speculation under tp_mesh with a FACTORED draft head
    (lm_head_lr on the draft params; param_specs replicates the small
    U/V factors across shards): greedy output must still equal vanilla
    greedy — the factored head only changes which drafts are proposed,
    never what is emitted."""
    import dataclasses

    from powerserve_tpu.parallel.tp import shard_params_tp
    from powerserve_tpu.speculative.chain import self_draft_config
    from powerserve_tpu.speculative.draft_head import make_draft_head

    cfg, params = model
    mesh = make_mesh({"dp": 2, "tp": 4})
    d_llm = self_draft_config(cfg.llm, 1)
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    u, v = make_draft_head(params.lm_head, rank=32, oversample=8)
    d_params = dataclasses.replace(params, lm_head_lr=(u, v))
    p2 = shard_params_tp(params, mesh, cfg.llm)
    d2 = shard_params_tp(d_params, mesh, cfg.llm)
    assert d2.lm_head_lr is not None
    s = BatchScheduler(p2, cfg, hp, backend="xla", tp_mesh=mesh,
                       draft_params=d2, draft_llm=d_llm, spec_k=2)
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


# ---------------------------------------------------------------------------
# EAGLE x shard_map tp (VERDICT r4 item 3): the head shards like a
# target layer and the whole eagle scan runs inside one shard_map
# ---------------------------------------------------------------------------

PRESETS.setdefault("tpserve-head", dict(dim=256, ffn=512, layers=1,
                                        heads=8, kv_heads=8, vocab=512,
                                        arch="llama", bias=False))


def _mk_eagle_head(model, seed=7):
    """Random 1-layer EAGLE head with the target's geometry (worst-case
    acceptance — losslessness must hold for ANY head weights)."""
    import dataclasses

    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.models.loader import _qlinear_from_float
    from powerserve_tpu.speculative.eagle import EagleParams

    cfg, params = model
    _, head = make_device_params("tpserve-head", quant="q4_k", seed=seed,
                                 stacked=False)
    dim = cfg.llm.dim
    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((dim, 2 * dim)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(fc=fc, fc_bias=None, layers=(head.layers[0],),
                     embed=params.embed, lm_head=params.lm_head,
                     out_norm=None, input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)
    return e_llm, ep


def _tp_eagle_sched(model, mesh, hp, backend="xla", rank=0):
    from powerserve_tpu.parallel.tp import shard_eagle_tp, shard_params_tp

    cfg, params = model
    e_llm, ep = _mk_eagle_head(model)
    if rank:
        import dataclasses

        from powerserve_tpu.speculative.draft_head import make_draft_head

        ep = dataclasses.replace(
            ep, lm_head_lr=make_draft_head(ep.lm_head, rank=rank))
    p2 = shard_params_tp(params, mesh, cfg.llm)
    ep2 = shard_eagle_tp(ep, mesh, e_llm)
    return BatchScheduler(p2, cfg, hp, backend=backend, tp_mesh=mesh,
                          eagle_params=ep2, eagle_llm=e_llm), (e_llm, ep)


def test_tp_scheduler_eagle_chain_matches(model, ref_tokens):
    """EAGLE chain speculation under tp_mesh: greedy output must equal
    the single-device plain scheduler (lossless through the sharded
    head's psums / vocab-sharded verify)."""
    mesh = make_mesh({"dp": 2, "tp": 4})
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.spec_k = 2
    s, _ = _tp_eagle_sched(model, mesh, hp)
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_tp_scheduler_eagle_tree_matches(model, ref_tokens):
    """EAGLE-2-style tree drafting under tp_mesh (hp.spec_tree)."""
    mesh = make_mesh({"dp": 2, "tp": 4})
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.spec_tree = "2,1"
    s, _ = _tp_eagle_sched(model, mesh, hp)
    assert s.spec_template is not None
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_tp_scheduler_eagle_factored_head_matches(model, ref_tokens):
    """EAGLE x tp with the factored (low-rank) draft head: the
    replicated U/V factors change which drafts are proposed, never
    what is emitted."""
    mesh = make_mesh({"dp": 2, "tp": 4})
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.spec_k = 2
    s, _ = _tp_eagle_sched(model, mesh, hp, rank=32)
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_tp_scheduler_paged_dp(model, ref_tokens):
    """Paged pool x DATA parallel (VERDICT r4 item 7): the pool's page
    axis shards over dp (PagePool n_groups confines each dp group's
    slots to its own partition; the shard_map body remaps global page
    ids to shard-local) — greedy output must equal single-device."""
    mesh = make_mesh({"dp": 2, "tp": 4})
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.paged_pages = 16
    hp.page_size = 8
    s, _ = _tp_sched(model, mesh, hp=hp)
    assert s.pool.n_groups == 2
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_tp_scheduler_paged_dp_preempt(model, ref_tokens):
    """Pool preemption under dp groups: a starved slot only evicts
    same-group victims, and recompute-readmission still reproduces
    greedy output with a pool sized to force preemption."""
    mesh = make_mesh({"dp": 2, "tp": 4})
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.paged_pages = 10  # 5 pages/group x 8 tokens: tight for 2 slots
    hp.page_size = 8
    s, _ = _tp_sched(model, mesh, hp=hp)
    try:
        got = _run(s, PROMPTS, max_tokens=12, timeout=480)
    finally:
        s.stop()
    # slot/group assignment may serialize the requests; output must
    # still equal the unconstrained single-device scheduler's
    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    ref = BatchScheduler(model[1], model[0], hp2, backend="xla")
    try:
        want = _run(ref, PROMPTS, max_tokens=12)
    finally:
        ref.stop()
    assert got == want


def test_page_pool_groups_unit():
    """PagePool n_groups: allocation stays inside a slot's group
    partition; release returns pages to the right group."""
    from powerserve_tpu.kv.paged import PagePool

    pool = PagePool(n_pages=8, n_slots=4, max_pages=4, page_size=8,
                    n_groups=2)
    assert pool.group_of(0) == 0 and pool.group_of(2) == 1
    assert pool.ensure(0, 32)  # 4 pages: all of group 0's partition
    assert all(p < 4 for p in pool.owned[0])
    assert not pool.ensure(1, 8)  # group 0 dry
    assert pool.ensure(2, 32)  # group 1 partition unaffected
    assert all(4 <= p < 8 for p in pool.owned[2])
    assert pool.n_free_for(1) == 0 and pool.n_free == 0
    pool.release(0)
    assert pool.n_free_for(1) == 4
    assert pool.ensure(1, 16)
    assert all(p < 4 for p in pool.owned[1])
