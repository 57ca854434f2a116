"""Paged-pool continuous batching: oversubscription, deferred
admission, recompute preemption — greedy outputs must match the dense
scheduler exactly (preemption re-prefills prompt + generated, which
rebuilds identical KV)."""

import threading

import numpy as np
import pytest

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.engine.scheduler import BatchScheduler, Request
from powerserve_tpu.models.loader import load_gguf_model
from powerserve_tpu.tools.synthetic import make_synthetic_gguf


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("ws")
    make_synthetic_gguf(out, "tiny", GGMLType.Q8_0, seed=0, seq_len=128)
    return load_gguf_model(out / "model")


def _run_requests(sched, prompts, max_tokens):
    events, outs = [], []
    for p in prompts:
        done = threading.Event()
        out = []

        def sink(t, out=out, done=done):
            done.set() if t is None else out.append(t)

        sched.submit(Request(prompt_ids=list(p), max_tokens=max_tokens,
                             temperature=0.0, sink=sink))
        events.append(done)
        outs.append(out)
    sched.start()
    for d in events:
        assert d.wait(timeout=300), "request did not finish"
    return outs


def _dense_reference(tiny, prompts, max_tokens):
    cfg, params = tiny
    hp = HyperParams(max_slots=2, batch_size=8)
    s = BatchScheduler(params, cfg, hp, backend="xla")
    try:
        return _run_requests(s, prompts, max_tokens)
    finally:
        s.stop()


PROMPTS = [list(range(3, 23)), list(range(40, 60))]  # 20 tokens each


@pytest.fixture(scope="module")
def dense_out(tiny):
    return _dense_reference(tiny, PROMPTS, 12)


def _paged(tiny, n_pages, page_size=8, slots=2):
    cfg, params = tiny
    hp = HyperParams(max_slots=slots, batch_size=8,
                     paged_pages=n_pages, page_size=page_size)
    return BatchScheduler(params, cfg, hp, backend="xla")


def test_paged_scheduler_matches_dense(tiny, dense_out):
    """Ample pool: no preemption, outputs equal dense."""
    s = _paged(tiny, n_pages=16)
    try:
        outs = _run_requests(s, PROMPTS, 12)
    finally:
        s.stop()
    assert outs == dense_out
    assert s.n_preemptions == 0


def test_paged_preemption_recompute(tiny, dense_out):
    """Pool fits both prefills but not both decodes: one slot gets
    preempted mid-generation, re-queues with prompt+generated, and the
    final outputs still match the dense scheduler greedily."""
    # 6 pages * 8 = 48 tokens; prompts use ceil(21/8)=3 pages each, so
    # the first decode growth past 24 tokens must preempt
    s = _paged(tiny, n_pages=6)
    try:
        outs = _run_requests(s, PROMPTS, 12)
        m = s.metrics()
    finally:
        s.stop()
    assert outs == dense_out
    assert s.n_preemptions >= 1
    assert m["paged_pages_total"] == 6
    assert m["paged_pages_free"] == 6  # all released after teardown


def test_paged_deferred_admission(tiny, dense_out):
    """Pool only fits one request at a time: the second waits for the
    first to finish, then completes with identical output."""
    s = _paged(tiny, n_pages=4)  # 32 tokens: one 21-token request + decode
    try:
        outs = _run_requests(s, PROMPTS, 12)
    finally:
        s.stop()
    assert outs == dense_out


def test_paged_solo_request_capped_by_pool(tiny):
    """A single request larger than the whole pool finishes with
    'length' at pool capacity instead of thrashing forever."""
    cfg, params = tiny
    s = _paged(tiny, n_pages=3)  # 24 tokens total
    done = threading.Event()
    out = []

    def sink(t):
        done.set() if t is None else out.append(t)

    req = Request(prompt_ids=list(range(2, 18)), max_tokens=64,
                  temperature=0.0, sink=sink)
    s.submit(req)
    s.start()
    try:
        assert done.wait(timeout=300)
    finally:
        s.stop()
    assert req.finish_reason == "length"
    # 16-token prompt: 15 prefilled + decode up to the 24-token pool cap
    assert 1 <= len(out) <= 24 - 15


def _run_stepwise(sched, prompt, max_tokens=8):
    import queue as _q

    out, done = [], _q.Queue()

    def sink(t):
        done.put(True) if t is None else out.append(t)

    sched.submit(Request(prompt_ids=list(prompt), max_tokens=max_tokens,
                         temperature=0.0, sink=sink))
    for _ in range(500):
        if not done.empty():
            break
        sched.step()
    assert not done.empty(), "request did not finish"
    return out


def test_paged_spec_matches_plain(tiny):
    """Paged pool composes with batched chain speculation: full-depth
    self-draft greedy output equals the plain dense scheduler's."""
    cfg, params = tiny
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=128)
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = _run_stepwise(plain, [3, 17, 5, 9])
    plain.stop()

    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=128,
                      paged_pages=16, page_size=16, spec_k=3)
    spec = BatchScheduler(params, cfg, hp2, backend="xla",
                          draft_params=params, draft_llm=cfg.llm)
    got = _run_stepwise(spec, [3, 17, 5, 9])
    spec.stop()
    assert got == want


def test_paged_spec_preemption(tiny):
    """Spec tick preempts when the pool can't hold the transient tree:
    outputs still match, the preemption actually happened."""
    cfg, params = tiny
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=128)
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    p1, p2 = list(range(3, 11)), list(range(40, 48))  # 8 tokens each
    w1 = _run_stepwise(plain, p1, 10)
    w2 = _run_stepwise(plain, p2, 10)
    plain.stop()

    # pool: 5 pages * 8 = 40 tokens. Admission (9 tokens) takes 2 pages
    # per slot; the first spec tick needs pos + horizon*(k+1) + (k+1) =
    # 8 + 12 = 20 tokens = 3 pages, so with 4/5 pages held one slot
    # grows and the other must PREEMPT (not just defer at admission)
    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=128,
                      paged_pages=5, page_size=8, spec_k=3)
    spec = BatchScheduler(params, cfg, hp2, backend="xla",
                          draft_params=params, draft_llm=cfg.llm)
    import queue as _q

    outs, dones = [], []
    for p in (p1, p2):
        out, done = [], _q.Queue()

        def sink(t, out=out, done=done):
            done.put(True) if t is None else out.append(t)

        spec.submit(Request(prompt_ids=p, max_tokens=10, temperature=0.0,
                            sink=sink))
        outs.append(out)
        dones.append(done)
    for _ in range(1000):
        if all(not d.empty() for d in dones):
            break
        spec.step()
    assert all(not d.empty() for d in dones)
    spec.stop()
    assert outs[0] == w1 and outs[1] == w2
    assert spec.n_preemptions >= 1


def test_paged_spec_prefix_cache_hit(tiny):
    """Prefix cache on a paged+spec scheduler: the second request's
    shared prefix restores into freshly allocated pages (target paged,
    draft dense) and greedy output still matches the plain scheduler."""
    cfg, params = tiny
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=128)
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    prefix = list(range(3, 21))  # 18 tokens (>= prefix_cache_min 16)
    p1 = prefix + [30, 31]
    # the cache key is p1's PREFILLED prompt (p1[:-1]); p2 extends it
    p2 = prefix + [30, 41, 42]
    w1 = _run_stepwise(plain, p1, 8)
    w2 = _run_stepwise(plain, p2, 8)
    plain.stop()

    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=128,
                      paged_pages=16, page_size=8, spec_k=3,
                      prefix_cache=4, prefix_cache_min=16)
    spec = BatchScheduler(params, cfg, hp2, backend="xla",
                          draft_params=params, draft_llm=cfg.llm)
    g1 = _run_stepwise(spec, p1, 8)
    g2 = _run_stepwise(spec, p2, 8)
    hits = spec.prefix_cache.hits
    spec.stop()
    assert g1 == w1 and g2 == w2
    assert hits >= 1  # the second request reused the cached prefix


@pytest.mark.parametrize("db", [True, False])
def test_paged_preemption_prefers_youngest(tiny, db):
    """When an OLDER request hits pool exhaustion, the YOUNGEST
    page-holder is preempted (least recompute lost), not the older
    requester itself. db=True runs the r5 double-buffered pool ticks
    (host position mirror), where the youngest can be preempted before
    its first drain — detection then relies on the older request's
    prompt staying intact (the only other page holder)."""
    import queue as _q

    cfg, params = tiny
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64,
                     paged_pages=4, page_size=8, prefix_cache=0)
    hp.double_buffer = db
    s = BatchScheduler(params, cfg, hp, backend="xla")

    def submit(prompt, n):
        out, done = [], _q.Queue()

        def sink(t, out=out, done=done):
            done.put(True) if t is None else out.append(t)

        r = s.submit(Request(prompt_ids=list(prompt), max_tokens=n,
                             temperature=0.0, sink=sink))
        return r, out, done

    p8 = list(range(3, 11))
    r0, o0, d0 = submit(p8, 2)  # slot0, finishes fast, frees 2 pages
    r1, o1, d1 = submit(list(range(20, 28)), 12)  # slot1, long-running
    while d0.empty():
        s.step()
    r2, o2, d2 = submit(list(range(40, 48)), 12)  # takes slot0, YOUNGEST
    # both residents need a 3rd page past pos 12 with the pool full:
    # whichever hits exhaustion, the YOUNGEST (r2) must be the victim —
    # the older r1 keeps its pages and its prompt never grows
    for _ in range(500):
        if not d1.empty() and not d2.empty():
            break
        s.step()
    assert not d1.empty() and not d2.empty()
    s.stop()
    assert s.n_preemptions >= 1
    assert len(o1) == 12 and len(o2) == 12
    # r1 (older) was never preempted: a preempted request re-queues
    # with prompt + generated, so its prompt would have grown. r0
    # finished before r2 existed, so with r1 intact the recorded
    # preemptions can only have hit the youngest (r2) — which under
    # double-buffered ticks may be evicted at 0 generated tokens
    # (prompt unchanged).
    assert len(r1.prompt_ids) == 8, "older request was preempted"
    if not db:
        assert len(r2.prompt_ids) > 8, "youngest was not the victim"


def test_paged_mm_embeds_preemption(tiny):
    """Multimodal (embeds) requests on the paged pool: preemption must
    extend the embedding rows with table lookups for the generated
    tokens so the recompute prefill stays aligned — output equals the
    unpreempted dense run."""
    import queue as _q

    cfg, params = tiny
    llm = cfg.llm
    rng = np.random.default_rng(9)
    P = 10
    ids = rng.integers(0, llm.vocab_size, P).tolist()
    # "vision" embeddings = the real table rows (so dense/paged agree)
    import jax.numpy as jnp

    emb = np.asarray(params.embed.lookup(jnp.asarray([ids]))[0],
                     np.float32)

    def run(hp):
        s = BatchScheduler(params, cfg, hp, backend="xla",
                           mm_dim=llm.dim)
        outs = []
        for k in range(2):
            out, done = [], _q.Queue()

            def sink(t, out=out, done=done):
                done.put(True) if t is None else out.append(t)

            s.submit(Request(prompt_ids=list(ids), max_tokens=10,
                             temperature=0.0, embeds=emb.copy(),
                             sink=sink))
            outs.append((out, done))
        for _ in range(500):
            if all(not d.empty() for _, d in outs):
                break
            s.step()
        assert all(not d.empty() for _, d in outs)
        n_pre = getattr(s, "n_preemptions", 0)
        s.stop()
        return [o for o, _ in outs], n_pre

    dense_hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64,
                           prefix_cache=0)
    want, _ = run(dense_hp)

    # 4 pages x 8 = 32 tokens: both 11-token admissions fit (2 pages
    # each) but decode growth past 16 forces a preemption
    paged_hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64,
                           prefix_cache=0, paged_pages=4, page_size=8)
    got, n_pre = run(paged_hp)
    assert got == want
    assert n_pre >= 1


def test_paged_window_decode_matches_carry(tiny, monkeypatch):
    """Paged-pool scheduler ticks under the window decode loop (pool
    slabs loop-invariant; one post-scan page-table commit) emit greedy
    streams identical to the carry loop, including a pool tight enough
    to force recompute preemption mid-stream."""
    import powerserve_tpu.engine.loops as L

    def run(loop, n_pages):
        monkeypatch.setattr(L, "_DECODE_LOOP_DEFAULT", loop)
        s = _paged(tiny, n_pages=n_pages)
        try:
            assert s.decode_window == (loop == "window")
            return _run_requests(s, PROMPTS, 12), s.n_preemptions
        finally:
            s.stop()

    w_ample, _ = run("window", 16)
    c_ample, _ = run("carry", 16)
    assert w_ample == c_ample
    w_tight, pre_w = run("window", 6)
    assert w_tight == w_ample
    assert pre_w >= 1
