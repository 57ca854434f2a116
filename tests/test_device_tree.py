"""On-device batched tree speculation (speculative/device_tree.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.speculative.device_tree import (
    DeviceTreeEngine,
    TreeTemplate,
    tree_spec_scan,
)
from powerserve_tpu.speculative.engine import SpecStats
from powerserve_tpu.tools.bench_params import make_device_params


def _vanilla_greedy(params, cfg, prompt, n):
    """Greedy reference with the SAME prefill split as the spec engines
    (prefill prompt[:-1], feed the root Tq=1): batching the root into
    the prefill chunk instead changes float accumulation order enough to
    flip near-tied argmaxes on a random tiny model."""
    from powerserve_tpu.models.llama import forward

    llm = cfg.llm
    kv = KVCache.create(llm.n_layers, 1, llm.seq_len, llm.n_kv_heads,
                        llm.head_size, dtype="bf16")
    pos = jnp.arange(len(prompt) - 1, dtype=jnp.int32)[None, :]
    _, kv = forward(params, llm, kv, jnp.asarray([prompt[:-1]]), pos,
                    backend="xla", logits_mode="none")
    cur = prompt[-1]
    out = []
    for i in range(n):
        p = len(prompt) - 1 + i
        logits, kv = forward(params, llm, kv, jnp.asarray([[cur]]),
                             jnp.asarray([[p]], jnp.int32),
                             backend="xla", logits_mode="last")
        cur = int(np.argmax(np.asarray(logits)[0]))
        out.append(cur)
    return out


def test_template_topology():
    t = TreeTemplate.from_widths([2, 1])
    # root + 2 children + 2 grandchildren
    assert t.n_nodes == 5
    assert t.parents == [-1, 0, 0, 1, 2]
    assert t.ranks == [0, 0, 1, 0, 0]
    assert t.max_depth == 2
    assert [list(l) for l in t.levels] == [[0], [1, 2], [3, 4]]
    # chain is the width-1 special case
    c = TreeTemplate.from_widths([1, 1, 1])
    assert c.n_nodes == 4 and c.max_depth == 3
    np.testing.assert_array_equal(c.child_table[:, 0], [1, 2, 3, -1])
    # ancestor-or-self is reflexive + transitive up
    assert t.anc[3, 3] and t.anc[3, 1] and t.anc[3, 0]
    assert not t.anc[3, 2] and not t.anc[1, 2]


def test_template_validation():
    with pytest.raises(ValueError):
        TreeTemplate([0], [0])  # root must have parent -1
    with pytest.raises(ValueError):
        TreeTemplate([-1, 1], [0, 0])  # parent after child
    with pytest.raises(ValueError):
        TreeTemplate([-1, 0, 0], [0, 2])  # wrong length/ranks


@pytest.mark.parametrize("widths", [[1, 1, 1], [2, 2, 1]])
def test_tree_spec_greedy_matches_vanilla(widths):
    """Tree speculation is lossless under greedy verify, for chains and
    real trees, any draft quality."""
    cfg, params = make_device_params("tiny", "q8_0")
    prompt = [3, 17, 5, 9]
    want = _vanilla_greedy(params, cfg, prompt, 24)

    d_cfg, d_params = make_device_params("tiny", "q8_0", seed=7)
    cases = [
        dict(self_draft_layers=cfg.llm.n_layers),
        dict(self_draft_layers=max(cfg.llm.n_layers // 2, 1)),
        dict(draft_params=d_params, draft_cfg=d_cfg),
    ]
    tpl = TreeTemplate.from_widths(widths)
    for kw in cases:
        spec = DeviceTreeEngine(params, cfg, template=tpl, block_steps=4,
                                backend="xla", kv_dtype="bf16", **kw)
        got = list(spec.generate(prompt, 24))
        assert got == want, (widths, kw, got, want)


def test_tree_full_self_draft_accepts_deepest_path():
    """Draft == target: the argmax path through the tree is always
    accepted, so every step emits max_depth + 1 tokens."""
    cfg, params = make_device_params("tiny", "q8_0")
    tpl = TreeTemplate.from_widths([2, 1, 1])
    spec = DeviceTreeEngine(params, cfg,
                            self_draft_layers=cfg.llm.n_layers,
                            template=tpl, block_steps=4, backend="xla",
                            kv_dtype="bf16")
    stats = SpecStats()
    out = list(spec.generate([3, 17, 5], 16, stats=stats))
    assert len(out) == 16
    assert stats.tokens_per_step == tpl.max_depth + 1  # 4 tok/step


def test_tree_spec_batched_active_mask():
    """Inactive slots: counts 0, kv untouched, root unchanged."""
    cfg, params = make_device_params("tiny", "q8_0")
    llm = cfg.llm
    S = 2
    tpl = TreeTemplate.from_widths([2, 1])
    t_kv = KVCache.create(llm.n_layers, S, llm.seq_len, llm.n_kv_heads,
                          llm.head_size, "bf16")
    d_kv = KVCache.create(llm.n_layers, S, llm.seq_len, llm.n_kv_heads,
                          llm.head_size, "bf16")
    from powerserve_tpu.engine.loops import prefill_step

    prompt = np.asarray([[3, 17, 5, 9]] * S, np.int32)
    pos = np.broadcast_to(np.arange(4, dtype=np.int32), (S, 4))
    _, t_kv = prefill_step(params, jnp.asarray(prompt), jnp.asarray(pos),
                           t_kv, llm, "xla")
    _, d_kv = prefill_step(params, jnp.asarray(prompt), jnp.asarray(pos),
                           d_kv, llm, "xla")
    root = jnp.asarray([9, 9], jnp.int32)
    active = jnp.asarray([True, False])
    emitted, counts, t_kv2, d_kv2, root2, _ = tree_spec_scan(
        params, params, t_kv, d_kv, root, llm, llm, 2, tpl.key(), "xla",
        active=active)
    counts = np.asarray(counts)
    assert (counts[:, 0] >= 1).all()
    assert (counts[:, 1] == 0).all()
    assert int(np.asarray(t_kv2.pos)[1]) == 4  # inactive slot unchanged
    assert int(np.asarray(root2)[1]) == 9
    # active slot committed exactly what it emitted
    total = int(counts[:, 0].sum())
    assert int(np.asarray(t_kv2.pos)[0]) == 4 + total
    assert int(np.asarray(d_kv2.pos)[0]) == 4 + total


def test_wor_tree_greedy_degenerates_to_vanilla():
    """sample='wor' with temp=0: one-hot q/p collapse the recursive
    rejection to exact greedy verification — output equals vanilla."""
    import jax

    cfg, params = make_device_params("tiny", "q8_0")
    llm = cfg.llm
    prompt = [3, 17, 5, 9]
    want = _vanilla_greedy(params, cfg, prompt, 12)

    from powerserve_tpu.engine.loops import prefill_step

    tpl = TreeTemplate.from_widths([2, 1])
    t_kv = KVCache.create(llm.n_layers, 1, llm.seq_len, llm.n_kv_heads,
                          llm.head_size, "bf16")
    d_kv = KVCache.create(llm.n_layers, 1, llm.seq_len, llm.n_kv_heads,
                          llm.head_size, "bf16")
    toks = jnp.asarray([prompt[:-1]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None, :]
    _, t_kv = prefill_step(params, toks, pos, t_kv, llm, "xla")
    _, d_kv = prefill_step(params, toks, pos, d_kv, llm, "xla")
    root = jnp.asarray([prompt[-1]], jnp.int32)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(1))
    z = jnp.zeros(1, jnp.float32)
    emitted, counts, *_ = tree_spec_scan(
        params, params, t_kv, d_kv, root, llm, llm, 8, tpl.key(), "xla",
        rngs=rngs, temp=z, top_k=jnp.full(1, 8, jnp.int32),
        top_p=jnp.ones(1), sample="wor")
    emitted = np.asarray(emitted)
    counts = np.asarray(counts)
    got = []
    for i in range(8):
        got.extend(int(t) for t in emitted[i, 0, :counts[i, 0]])
    assert got[:12] == want, (got[:12], want)


def test_wor_tree_lossless_and_beats_exact_match():
    """Without-replacement multi-candidate verification: the first
    emitted token's marginal equals the target sampling distribution
    (TV-tested over 4096 slots), and with a PERFECT draft (q == p,
    full-depth self-draft) the rank-0 candidate always accepts — every
    step emits max_depth + 1 tokens, above the exact-match scheme's
    E[prod p(sample)] expectation on a flat dist."""
    import jax

    from powerserve_tpu.models.llama import forward
    from powerserve_tpu.sampling.sampler import sample_dist_batched

    cfg, params = make_device_params("tiny", "q8_0")
    llm = cfg.llm
    S = 4096
    tpl = TreeTemplate.from_widths([2, 1])
    root = jnp.full((S,), 7, jnp.int32)
    temp = jnp.full((S,), 1.0, jnp.float32)
    top_k = jnp.full((S,), 8, jnp.int32)
    top_p = jnp.ones((S,), jnp.float32)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))

    def fresh():
        return KVCache.create(llm.n_layers, S, 16, llm.n_kv_heads,
                              llm.head_size, "int8")

    logits, _ = forward(params, llm, fresh(), root[:, None],
                        jnp.zeros((S, 1), jnp.int32), backend="xla",
                        logits_mode="last")
    p0 = np.asarray(sample_dist_batched(logits[:, :llm.vocab_size],
                                        temp, top_k, top_p)[0])

    emitted, counts, *_ = tree_spec_scan(
        params, params, fresh(), fresh(), root, llm, llm, 1, tpl.key(),
        "xla", rngs=rngs, temp=temp, top_k=top_k, top_p=top_p,
        sample="wor")
    emitted = np.asarray(emitted)[0]  # [S, D+1]
    counts = np.asarray(counts)[0]

    hist = np.bincount(emitted[:, 0], minlength=llm.vocab_size)
    hist = hist.astype(np.float64) / hist.sum()
    tv = 0.5 * np.abs(hist - p0).sum()
    assert tv < 0.08, f"first-token marginal TV {tv}"
    # perfect draft: q == p -> min(1, p/q) = 1 at rank 0, every level
    assert counts.mean() > 0.95 * (tpl.max_depth + 1), counts.mean()


def test_wor_beats_exact_match_acceptance_imperfect_draft():
    """The motivating case: with an IMPERFECT draft at temperature,
    sampled-without-replacement verification accepts more tokens/step
    than exact-match against the target's samples (on flat random-model
    dists exact-match collapses to E[p(sample)])."""
    import jax

    cfg, params = make_device_params("tiny", "q8_0")
    from powerserve_tpu.speculative.chain import self_draft_config

    llm = cfg.llm
    d_llm = self_draft_config(llm, max(llm.n_layers // 2, 1))
    S = 2048
    tpl = TreeTemplate.from_widths([2, 1])
    root = jnp.full((S,), 7, jnp.int32)
    temp = jnp.full((S,), 1.0, jnp.float32)
    top_k = jnp.full((S,), 8, jnp.int32)
    top_p = jnp.ones((S,), jnp.float32)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))

    def fresh():
        return KVCache.create(llm.n_layers, S, 16, llm.n_kv_heads,
                              llm.head_size, "int8")

    means = {}
    for mode in (True, "wor"):
        _, counts, *_ = tree_spec_scan(
            params, params, fresh(), fresh(), root, llm, d_llm, 1,
            tpl.key(), "xla", rngs=rngs, temp=temp, top_k=top_k,
            top_p=top_p, sample=mode)
        means[mode] = float(np.asarray(counts)[0].mean())
    assert means["wor"] > means[True] + 0.1, means


def test_wor_scheduler_greedy_matches_plain():
    """hp.spec_wor routes tree templates to WOR verification; greedy
    output still equals the plain scheduler's."""
    import queue as _q

    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.scheduler import BatchScheduler, Request

    cfg, params = make_device_params("tiny", "q8_0")

    def run_req(sched, prompt):
        out, done = [], _q.Queue()

        def sink(t):
            done.put(True) if t is None else out.append(t)

        sched.submit(Request(prompt_ids=prompt, max_tokens=6,
                             temperature=0.0, sink=sink))
        for _ in range(300):
            if not done.empty():
                break
            sched.step()
        assert not done.empty()
        return out

    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=128)
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = run_req(plain, [3, 17, 5, 9])

    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=128,
                      spec_tree="2,1", spec_wor=True)
    wor = BatchScheduler(params, cfg, hp2, backend="xla",
                         draft_params=params, draft_llm=cfg.llm)
    got = run_req(wor, [3, 17, 5, 9])
    assert got == want


def test_tree_draft_window_matches_carry(monkeypatch):
    """The DRAFT-side window (r5: per-query window-lane visibility
    replaces vis_override; node lanes commit at their compacted rope
    positions through the target's shared lane_pos/valid) must be
    byte-equal to the carried-compaction path — including a SECOND
    scan continuing from window-committed draft state, greedy and
    WOR."""
    import jax

    import powerserve_tpu.engine.loops as L
    from powerserve_tpu.engine.loops import prefill_step

    cfg, params = make_device_params("tiny", "q8_0")
    llm = cfg.llm
    tpl = TreeTemplate.from_widths([2, 2, 1])
    prompt = [3, 17, 5, 9]

    def run(loop, wor):
        monkeypatch.setattr(L, "_DECODE_LOOP_DEFAULT", loop)
        t_kv = KVCache.create(llm.n_layers, 1, 128, llm.n_kv_heads,
                              llm.head_size, "int8")
        d_kv = KVCache.create(llm.n_layers, 1, 128, llm.n_kv_heads,
                              llm.head_size, "int8")
        toks = jnp.asarray([prompt[:-1]], jnp.int32)
        pos = jnp.arange(3, dtype=jnp.int32)[None, :]
        _, t_kv = prefill_step(params, toks, pos, t_kv, llm, "xla")
        _, d_kv = prefill_step(params, toks, pos, d_kv, llm, "xla")
        root = jnp.asarray([prompt[-1]], jnp.int32)
        kw = dict(backend=f"xla{'' if loop == 'window' else ''}")
        if wor:
            kw.update(rngs=jax.vmap(jax.random.PRNGKey)(jnp.arange(1)),
                      temp=jnp.zeros(1), top_k=jnp.full(1, 8, jnp.int32),
                      top_p=jnp.ones(1), sample="wor")
        outs = []
        for _ in range(2):  # second scan continues from committed state
            emitted, counts, t_kv, d_kv, root, *_rest = tree_spec_scan(
                params, params, t_kv, d_kv, root, llm, llm, 3,
                tpl.key(), kw.pop("backend", "xla"), **kw)
            kw["backend"] = "xla"
            outs.append((np.asarray(emitted), np.asarray(counts)))
        return outs, (np.asarray(t_kv.pos), np.asarray(d_kv.pos),
                      np.asarray(t_kv.mask), np.asarray(d_kv.mask))

    for wor in (False, True):
        (w_out, w_state) = run("window", wor)
        (c_out, c_state) = run("carry", wor)
        for (we, wc), (ce, cc) in zip(w_out, c_out):
            assert (wc == cc).all(), (wor, wc, cc)
            assert (we == ce).all(), (wor, we, ce)
        for a, b in zip(w_state, c_state):
            assert (a == b).all(), wor
