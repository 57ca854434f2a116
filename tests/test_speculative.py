"""Speculative decoding tests: tree construction invariants, and the
lossless property — greedy speculative output must equal vanilla greedy
decode of the target model (the draft only accelerates)."""

import numpy as np
import jax.numpy as jnp
import pytest

from powerserve_tpu.core.config import ModelConfig
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.kv import KVCache
from powerserve_tpu.models import forward, params_from_hf_state_dict
from powerserve_tpu.speculative.engine import SpecStats, SpeculativeEngine
from powerserve_tpu.speculative.tree import (
    SpeculativeConfig,
    TokenTree,
    grow_tree,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# tree unit tests
# ---------------------------------------------------------------------------

def test_tree_ancestor_mask():
    t = TokenTree()
    r = t.add(10, -1, 1.0)
    a = t.add(11, r, 0.6)
    b = t.add(12, r, 0.3)
    c = t.add(13, a, 0.5)
    m = t.ancestor_mask()
    assert m[c, a] and m[c, r] and m[c, c]
    assert not m[c, b] and not m[a, b] and not m[b, a]
    assert m[r].sum() == 1


def test_tree_accepted_chain():
    t = TokenTree()
    r = t.add(10, -1, 1.0)
    a = t.add(11, r, 0.6)
    b = t.add(12, r, 0.3)
    c = t.add(13, a, 0.5)
    # target samples: at root -> 11 (match a), at a -> 99 (no child match)
    sampled = np.zeros(4, np.int64)
    sampled[r] = 11
    sampled[a] = 99
    accepted, emitted = t.accepted_chain(sampled)
    assert accepted == [a]
    assert emitted == [11, 99]


def test_grow_tree_budget_and_order():
    cfg = SpeculativeConfig(draft_batch_size=6, draft_top_k=4,
                            max_fan_out=2, min_prob=0.01, p_base=0.99)

    def draft_step(tokens, depths, tree, frontier):
        F = len(tokens)
        probs = np.tile(np.array([0.5, 0.3, 0.15, 0.05]), (F, 1))
        ids = np.tile(np.arange(100, 104), (F, 1))
        return probs, ids

    tree = grow_tree(7, cfg, draft_step)
    assert tree.size <= 6
    assert tree.nodes[0].token == 7 and tree.nodes[0].parent == -1
    # children have decreasing cum_prob in insertion order per level
    cums = [n.cum_prob for n in tree.nodes[1:3]]
    assert cums == sorted(cums, reverse=True)


def test_grow_tree_min_prob_prunes():
    cfg = SpeculativeConfig(draft_batch_size=12, draft_top_k=4,
                            max_fan_out=4, min_prob=0.4, p_base=1.0)

    def draft_step(tokens, depths, tree, frontier):
        F = len(tokens)
        probs = np.tile(np.array([0.5, 0.3, 0.1, 0.1]), (F, 1))
        ids = np.tile(np.arange(4), (F, 1))
        return probs, ids

    tree = grow_tree(0, cfg, draft_step)
    # depth 1: only 0.5 survives (0.3 < min_prob as non-first);
    # depth 2: 0.25 < 0.4 kept only if first candidate of the level
    assert all(n.cum_prob >= 0.2 for n in tree.nodes[1:])


# ---------------------------------------------------------------------------
# end-to-end losslessness
# ---------------------------------------------------------------------------

def _mk_model(seed, layers=2, dim=64):
    import transformers

    torch.manual_seed(seed)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=dim, intermediate_size=2 * dim,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig(arch="llama")
    llm = cfg.llm
    llm.dim = dim
    llm.hidden_dim = 2 * dim
    llm.n_layers = layers
    llm.n_heads = 4
    llm.n_kv_heads = 2
    llm.head_size = dim // 4
    llm.seq_len = 256
    llm.vocab_size = 256
    llm.kv_dim = 2 * (dim // 4)
    llm.rope.n_dims = dim // 4
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg, fmt=GGMLType.Q8_0)
    return params, cfg


def _vanilla_greedy(params, cfg, prompt, n, return_gaps=False):
    kv = KVCache.create(cfg.llm.n_layers, 1, 256, cfg.llm.n_kv_heads,
                        cfg.llm.head_size, dtype="bf16")
    toks = list(prompt)
    # prefill all but last
    pos = jnp.arange(len(toks) - 1)[None, :]
    _, kv = forward(params, cfg.llm, kv, jnp.asarray([toks[:-1]]), pos,
                    backend="xla", logits_mode="none")
    cur = toks[-1]
    out, gaps = [], []
    for i in range(n):
        p = len(toks) - 1 + i
        logits, kv = forward(params, cfg.llm, kv,
                             jnp.asarray([[cur]]),
                             jnp.asarray([[p]], jnp.int32),
                             backend="xla", logits_mode="last")
        row = np.asarray(logits)[0]
        cur = int(np.argmax(row))
        out.append(cur)
        top2 = np.partition(row, -2)[-2:]
        gaps.append(float(top2[1] - top2[0]))
    if return_gaps:
        return out, gaps
    return out


def _assert_greedy_equiv(got, want, gaps, ctx):
    """Greedy spec == vanilla greedy, modulo fp-reassociation at
    near-ties: the Tq=k verify computes the same logits as the Tq=1
    decode up to gemm-shape rounding (a pre-existing, benign ~0.2
    absolute difference on tiny random models), so streams may only
    diverge at a step whose top-2 logit gap is within that rounding."""
    if got == want:
        return
    i = next(j for j, (a, b) in enumerate(zip(got, want)) if a != b)
    assert gaps[i] < 0.5, (ctx, i, gaps[i], got, want)
    # everything before the near-tie must match exactly
    assert got[:i] == want[:i], (ctx, i, got, want)


@pytest.mark.parametrize("same_draft", [True, False])
def test_speculative_matches_vanilla_greedy(same_draft):
    t_params, t_cfg = _mk_model(0)
    if same_draft:
        d_params, d_cfg = t_params, t_cfg
    else:
        d_params, d_cfg = _mk_model(1, layers=1)

    prompt = [1, 17, 42, 63, 99]
    N = 12
    ref = _vanilla_greedy(t_params, t_cfg, prompt, N)

    eng = SpeculativeEngine(t_params, t_cfg, d_params, d_cfg,
                            SpeculativeConfig(draft_batch_size=8,
                                              draft_top_k=4),
                            max_seq=256, kv_dtype="bf16", backend="xla")
    stats = SpecStats()
    got = []
    for t in eng.generate(prompt, N, stats=stats):
        got.append(t)
    assert got[:N] == ref, f"spec={got} ref={ref} ({stats.summary()})"
    assert stats.steps > 0
    if same_draft:
        # a perfect draft should accept nearly everything
        assert stats.accept_rate > 0.5, stats.summary()


def test_speculative_emits_at_least_one_per_step():
    t_params, t_cfg = _mk_model(2)
    d_params, d_cfg = _mk_model(3, layers=1)
    eng = SpeculativeEngine(t_params, t_cfg, d_params, d_cfg,
                            SpeculativeConfig(draft_batch_size=6,
                                              draft_top_k=3),
                            max_seq=256, kv_dtype="bf16", backend="xla")
    stats = SpecStats()
    out = list(eng.generate([5, 6, 7], 6, stats=stats))
    assert len(out) >= 6
    assert stats.emitted >= stats.steps


# ---------------------------------------------------------------------------
# on-device chain speculation (speculative/chain.py)
# ---------------------------------------------------------------------------

def test_chain_spec_greedy_matches_vanilla():
    """Chain speculation is lossless under greedy verify: output equals
    vanilla greedy decode regardless of draft quality (full self-draft,
    truncated self-draft, and an unrelated draft model)."""
    from powerserve_tpu.speculative.chain import ChainSpecEngine
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params("tiny", "q8_0")
    prompt = [3, 17, 5, 9]
    want, gaps = _vanilla_greedy(params, cfg, prompt, 24, return_gaps=True)

    d_cfg, d_params = make_device_params("tiny", "q8_0", seed=7)
    cases = [
        dict(self_draft_layers=cfg.llm.n_layers),  # draft == target
        dict(self_draft_layers=max(cfg.llm.n_layers // 2, 1)),
        dict(draft_params=d_params, draft_cfg=d_cfg),  # unrelated draft
    ]
    for kw in cases:
        # bf16 KV: int8 cache quantization amplifies the (benign)
        # numeric difference between Tq=4 verify forwards and Tq=1
        # vanilla forwards enough to flip argmax on a random tiny model
        spec = ChainSpecEngine(params, cfg, k=3, block_steps=4,
                               backend="xla", kv_dtype="bf16", **kw)
        got = list(spec.generate(prompt, 24))
        _assert_greedy_equiv(got, want, gaps, kw)


def test_chain_spec_acceptance_stats():
    """Full self-draft (draft == target) accepts every drafted token."""
    from powerserve_tpu.speculative.chain import ChainSpecEngine
    from powerserve_tpu.speculative.engine import SpecStats
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params("tiny", "q8_0")
    spec = ChainSpecEngine(params, cfg, self_draft_layers=cfg.llm.n_layers,
                           k=3, block_steps=4, backend="xla")
    stats = SpecStats()
    out = list(spec.generate([3, 17, 5], 16, stats=stats))
    assert len(out) == 16
    assert stats.accept_rate == 1.0
    assert stats.tokens_per_step == 4.0  # k+1 per step


def test_chain_sample_scan_greedy_matches_plain_scheduler():
    """Default chain speculation now runs stochastic rejection
    sampling; at temperature 0 it must still equal plain greedy."""
    import queue as _q

    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.scheduler import BatchScheduler, Request
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params("tiny", "q8_0")

    def run_req(sched, prompt):
        out, done = [], _q.Queue()

        def sink(t):
            if t is None:
                done.put(True)
            else:
                out.append(t)

        sched.submit(Request(prompt_ids=prompt, max_tokens=6,
                             temperature=0.0, sink=sink))
        while done.empty():
            if not sched.step():
                break
        return out

    hp = HyperParams(max_slots=2, batch_size=8)
    hp.max_seq_len = 128
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = run_req(plain, [3, 17, 5, 9])

    hp2 = HyperParams(max_slots=2, batch_size=8)
    hp2.max_seq_len = 128
    hp2.spec_k = 3
    spec = BatchScheduler(params, cfg, hp2, backend="xla",
                          draft_params=params, draft_llm=cfg.llm)
    assert spec.spec_template.n_nodes == spec.spec_template.max_depth + 1
    got = run_req(spec, [3, 17, 5, 9])
    assert got == want, (got, want)


def test_rejection_sampling_lossless_and_higher_acceptance():
    """Statistical check of the speculative-sampling estimator: the
    first emitted token's marginal equals the target's sampling
    distribution (losslessness), and with a PERFECT draft (q == p,
    full-depth self-draft) acceptance is near 1 — far above the
    exact-match scheme's E[p(argmax)]."""
    import jax
    import jax.numpy as jnp

    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.models.llama import forward
    from powerserve_tpu.sampling.sampler import sample_dist_batched
    from powerserve_tpu.speculative.chain import chain_spec_sample_scan
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params("tiny", "q8_0")
    llm = cfg.llm
    S, k = 4096, 3
    root = jnp.full((S,), 7, jnp.int32)
    temp = jnp.full((S,), 1.0, jnp.float32)
    top_k = jnp.full((S,), 8, jnp.int32)
    top_p = jnp.ones((S,), jnp.float32)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))

    def fresh():
        return KVCache.create(llm.n_layers, S, 16, llm.n_kv_heads,
                              llm.head_size, "int8")

    # analytic target distribution at the root position
    logits, _ = forward(params, llm, fresh(), root[:, None],
                        jnp.zeros((S, 1), jnp.int32), backend="xla",
                        logits_mode="last")
    p = sample_dist_batched(logits[:, :llm.vocab_size], temp, top_k, top_p)
    p0 = np.asarray(p[0])  # identical rows

    emitted, counts, *_ = chain_spec_sample_scan(
        params, params, fresh(), fresh(), root, llm, llm, 1, k, "xla",
        rngs=rngs, temp=temp, top_k=top_k, top_p=top_p)
    emitted = np.asarray(emitted)[0]  # [S, k+1]
    counts = np.asarray(counts)[0]

    first = emitted[:, 0]
    hist = np.bincount(first, minlength=llm.vocab_size).astype(np.float64)
    hist /= hist.sum()
    tv = 0.5 * np.abs(hist - p0).sum()
    assert tv < 0.08, f"first-token marginal TV {tv}"

    # perfect draft: acceptance ~= 1 -> counts ~= k+1
    mean_tokens = counts.mean()
    assert mean_tokens > 0.9 * (k + 1), mean_tokens
    # exact-match baseline on the same flat-ish dist accepts far less:
    # E[tokens/step] = sum over prefixes of prod p(sample_j) + 1
    assert mean_tokens > 1.0 + k * float((p0 ** 2).sum()) + 0.5


def test_chain_window_matches_carry():
    """The window-verify chain scan (target cache loop-invariant, lane
    validity tracks rollback, one post-scan commit) is token- and
    cache-state-equivalent to the legacy carried-cache scan, including
    a follow-up scan continuing from the committed cache."""
    import jax
    import jax.numpy as jnp

    import powerserve_tpu.engine.loops as L
    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.models.llama import forward
    from powerserve_tpu.speculative.chain import (
        chain_spec_sample_scan,
        chain_spec_scan,
        self_draft_config,
    )
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params("tiny", "q8_0")
    llm = cfg.llm
    d_llm = self_draft_config(llm, 1)
    S, k, n_steps = 2, 3, 4

    def fresh(n_layers):
        return KVCache.create(n_layers, S, 96, llm.n_kv_heads,
                              llm.head_size, "int8")

    def prefill():
        t_kv, d_kv = fresh(llm.n_layers), fresh(d_llm.n_layers)
        tok = jnp.tile(jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32), (S, 1))
        pos = jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32), (S, 5))
        _, t_kv = forward(params, llm, t_kv, tok, pos, backend="xla",
                          logits_mode="none")
        _, d_kv = forward(params, d_llm, d_kv, tok, pos, backend="xla",
                          logits_mode="none")
        return t_kv, d_kv

    root = jnp.full((S,), 9, jnp.int32)
    temp = jnp.asarray([0.0, 0.9], jnp.float32)
    top_k = jnp.full((S,), 8, jnp.int32)
    top_p = jnp.ones((S,), jnp.float32)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))
    out = {}
    for loop in ("window", "carry"):
        orig = L._DECODE_LOOP_DEFAULT
        L._DECODE_LOOP_DEFAULT = loop
        chain_spec_sample_scan.clear_cache()  # loop choice bakes at trace
        try:
            t_kv, d_kv = prefill()
            em, cnt, t_kv, d_kv, r2, rg2 = chain_spec_sample_scan(
                params, params, t_kv, d_kv, root, llm, d_llm, n_steps, k,
                "xla", rngs=rngs, temp=temp, top_k=top_k, top_p=top_p)
            # continue: a second scan from the committed cache
            em2, cnt2, t_kv, d_kv, *_ = chain_spec_sample_scan(
                params, params, t_kv, d_kv, r2, llm, d_llm, 2, k, "xla",
                rngs=rg2, temp=temp, top_k=top_k, top_p=top_p)
            # draft cache committed state must match too (the draft
            # window shares the verify's lane_pos/valid at commit);
            # K/V contents compared only where mask=True — carry-mode
            # rollback leaves stale writes past pos, window never lands
            dm = np.asarray(d_kv.mask)
            out[loop] = (np.asarray(em), np.asarray(cnt), np.asarray(em2),
                         np.asarray(cnt2), np.asarray(t_kv.pos),
                         np.asarray(t_kv.mask), np.asarray(d_kv.pos), dm,
                         np.asarray(d_kv.k) * dm[None, :, None, :, None],
                         np.asarray(d_kv.v) * dm[None, :, None, :, None])
        finally:
            L._DECODE_LOOP_DEFAULT = orig
            chain_spec_sample_scan.clear_cache()
    for a, b in zip(out["window"], out["carry"]):
        np.testing.assert_array_equal(a, b)

    # greedy single-slot scan too
    out = {}
    for loop in ("window", "carry"):
        orig = L._DECODE_LOOP_DEFAULT
        L._DECODE_LOOP_DEFAULT = loop
        chain_spec_scan.clear_cache()
        try:
            cfgs, ps = make_device_params("tiny", "q8_0")
            t_kv = KVCache.create(llm.n_layers, 1, 96, llm.n_kv_heads,
                                  llm.head_size, "int8")
            d_kv = KVCache.create(d_llm.n_layers, 1, 96, llm.n_kv_heads,
                                  llm.head_size, "int8")
            toks, cnts, t_kv, *_ = chain_spec_scan(
                ps, ps, t_kv, d_kv, jnp.asarray(5, jnp.int32), llm, d_llm,
                n_steps, k, "xla")
            out[loop] = (np.asarray(toks), np.asarray(cnts),
                         np.asarray(t_kv.pos), np.asarray(t_kv.mask))
        finally:
            L._DECODE_LOOP_DEFAULT = orig
            chain_spec_scan.clear_cache()
    for a, b in zip(out["window"], out["carry"]):
        np.testing.assert_array_equal(a, b)


def test_factored_draft_head_lossless():
    """speculative/draft_head.py: (a) at full-ish rank the factored
    logits match the dense lm_head closely; (b) a greedy chain spec
    whose DRAFT uses the factored head still emits exactly the vanilla
    greedy stream (acceptance may drop; output may not); (c) the
    stochastic chain with a factored-draft q stays lossless — same
    temp-0 degeneration as the exact head."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.engine.loops import decode_scan
    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.models.llama import forward
    from powerserve_tpu.speculative.chain import (
        chain_spec_scan,
        self_draft_config,
    )
    from powerserve_tpu.speculative.draft_head import make_draft_head
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params("tiny", "q8_0")
    llm = cfg.llm
    # FULL rank on the tiny head: the factorization is exact up to
    # quantization (random weights have a flat spectrum, so a partial
    # rank would NOT track well — real lm_heads decay)
    u, v = make_draft_head(params.lm_head, rank=llm.dim, oversample=16)
    assert u.in_features == llm.dim and u.out_features == llm.dim
    assert v.in_features == llm.dim and v.out_features >= llm.vocab_size

    # (a) near-full-rank factored logits track the dense head
    kv = KVCache.create(llm.n_layers, 1, 32, llm.n_kv_heads,
                        llm.head_size, "int8")
    tok = jnp.asarray([[5, 9, 2]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    dense, _ = forward(params, llm, kv, tok, pos, backend="xla",
                       logits_mode="all")
    p_lr = dataclasses.replace(params, lm_head_lr=(u, v))
    kv = KVCache.create(llm.n_layers, 1, 32, llm.n_kv_heads,
                        llm.head_size, "int8")
    lr, _ = forward(p_lr, llm, kv, tok, pos, backend="xla",
                    logits_mode="all")
    c = np.corrcoef(np.asarray(dense).ravel(),
                    np.asarray(lr)[..., :llm.vocab_size].ravel())[0, 1]
    assert c > 0.995, c  # full-rank factorization: quantization only

    # (b) greedy chain spec with the factored DRAFT head == vanilla
    # (f32 KV like the other lossless tests: int8 cache quantization
    # amplifies benign near-tie argmax flips between the two paths)
    d_llm = self_draft_config(llm, 1)
    kv = KVCache.create(llm.n_layers, 1, 96, llm.n_kv_heads,
                        llm.head_size, "f32")
    want, _ = decode_scan(params, jnp.asarray([7], jnp.int32), kv, llm,
                          12, "xla")
    want = list(np.asarray(want)[0])
    t_kv = KVCache.create(llm.n_layers, 1, 96, llm.n_kv_heads,
                          llm.head_size, "f32")
    d_kv = KVCache.create(d_llm.n_layers, 1, 96, llm.n_kv_heads,
                          llm.head_size, "f32")
    toks, counts, *_ = chain_spec_scan(
        params, p_lr, t_kv, d_kv, jnp.asarray(7, jnp.int32), llm, d_llm,
        8, 3, "xla")
    toks, counts = np.asarray(toks), np.asarray(counts)
    got = [int(t) for i in range(8) for t in toks[i, :counts[i]]][:12]
    # losslessness: the emitted prefix equals vanilla greedy exactly
    # (acceptance may be 0 on this tiny model — 8 steps then emit 8)
    assert got == want[:len(got)] and len(got) >= 8
