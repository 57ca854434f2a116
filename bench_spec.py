#!/usr/bin/env python
"""Speculative-decoding device cost benchmark.

Random weights make acceptance rates meaningless, so this measures the
device-side cost structure of speculation and projects end-to-end
speedup for given acceptance (tokens/verify-step):

  t_decode  — target 1-token decode step           (the baseline)
  t_verify  — target tree-verify forward (Tq = draft_batch, ancestor
              mask); bandwidth-bound, so ~t_decode
  t_draft   — draft-model level forward (the per-level tree cost)

  projected tok/s = tokens_per_step / (t_verify + levels * t_draft)

The reference sustains ~2-3 accepted tokens/step at its default knobs
(README spec numbers ≈2x); the same acceptance applied to these costs
is the expected TPU speedup. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="llama-8b")
    ap.add_argument("--draft", default="llama-1b")
    ap.add_argument("--draft-batch", type=int, default=12)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--mode", default="cost",
                    choices=["cost", "chain", "eagle"],
                    help="cost: per-op cost model; chain: measured "
                         "tok/s of the on-device chain-spec loop; "
                         "eagle: measured tok/s of the on-device EAGLE "
                         "loop with a synthetic 1-layer head")
    ap.add_argument("--k", type=int, default=4,
                    help="chain draft length per step")
    ap.add_argument("--temp", type=float, default=0.0,
                    help="chain mode: > 0 measures the STOCHASTIC "
                         "rejection-sampling scan (chain_spec_sample_"
                         "scan) instead of the greedy scan")
    ap.add_argument("--self-draft-layers", type=int, default=0,
                    help="chain mode: layer-skip self-draft depth "
                         "(0 = use --draft as a separate model)")
    ap.add_argument("--tree", default="",
                    help="chain mode: measure tree_spec_scan with these "
                         "widths per depth (e.g. 2,1,1) instead of the "
                         "k-chain")
    ap.add_argument("--draft-rank", type=int, default=0,
                    help="chain/eagle mode: factor the DRAFT's lm_head "
                         "to this rank (speculative/draft_head.py) — "
                         "~7x fewer draft-head HBM bytes at r=512; "
                         "lossless, acceptance-rate tradeoff only")
    ap.add_argument("--wor", action="store_true",
                    help="with --tree and --temp > 0: sampled-without-"
                         "replacement children + recursive rejection "
                         "(hp.spec_wor semantics)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.models.llama import forward
    from powerserve_tpu.tools.bench_params import make_device_params

    def scan_forward(params, llm, kv, Tq, n_steps, intra=None):
        """Repeated forward at fixed Tq; returns avg seconds/step."""

        @jax.jit
        def run(params, kv, salt):
            def body(carry, _):
                kv, tok = carry
                pos = kv.pos[:, None] * 0  # fixed position: cost-model only
                tokens = jnp.broadcast_to(tok, (1, Tq))
                logits, kv2 = forward(params, llm, kv, tokens,
                                      jnp.broadcast_to(pos, (1, Tq)),
                                      intra_mask=intra, backend="auto",
                                      logits_mode="last")
                kv2 = kv2.rollback(Tq)  # keep cache size constant
                nxt = jnp.argmax(logits[:, :100], -1).astype(jnp.int32)[0]
                return (kv2, nxt), ()
            (kv, tok), _ = jax.lax.scan(body, (kv, salt), None,
                                        length=n_steps)
            # return the token chain — returning only bookkeeping lets
            # XLA dead-code-eliminate the whole model
            return tok
        # NOTE: vary `salt` between calls — identical inputs can be
        # served from an execution cache on remote-TPU links
        np.asarray(run(params, kv, jnp.int32(0)))  # compile + sync
        t0 = time.perf_counter()
        np.asarray(run(params, kv, jnp.int32(1)))
        return (time.perf_counter() - t0) / n_steps

    t_cfg, t_params = make_device_params(args.target, "q4_k")

    if args.mode == "chain":
        run_chain(args, t_cfg, t_params)
        return
    if args.mode == "eagle":
        run_eagle(args, t_cfg, t_params)
        return
    d_cfg, d_params = make_device_params(args.draft, "q4_k", seed=1)
    tl, dl = t_cfg.llm, d_cfg.llm
    t_kv = KVCache.create(tl.n_layers, 1, args.max_seq, tl.n_kv_heads,
                          tl.head_size, "int8")
    d_kv = KVCache.create(dl.n_layers, 1, args.max_seq, dl.n_kv_heads,
                          dl.head_size, "int8")

    B = args.draft_batch
    intra = jnp.tril(jnp.ones((B, B), bool))
    t_decode = scan_forward(t_params, tl, t_kv, 1, args.steps)
    t_kv = KVCache.create(tl.n_layers, 1, args.max_seq, tl.n_kv_heads,
                          tl.head_size, "int8")
    t_verify = scan_forward(t_params, tl, t_kv, B, args.steps, intra)
    t_draft = scan_forward(d_params, dl, d_kv, B, args.steps)

    base = 1.0 / t_decode
    proj = {}
    for tps in (1.5, 2.0, 2.5, 3.0):
        spec = tps / (t_verify + args.levels * t_draft)
        proj[f"tokens_per_step_{tps}"] = {
            "tok_s": round(spec, 1), "speedup": round(spec / base, 2)}

    print(json.dumps({
        "metric": "speculative_cost_model_8b_plus_1b",
        "t_decode_ms": round(t_decode * 1e3, 2),
        "t_verify_ms": round(t_verify * 1e3, 2),
        "t_draft_level_ms": round(t_draft * 1e3, 2),
        "baseline_tok_s": round(base, 1),
        "verify_overhead_vs_decode": round(t_verify / t_decode, 2),
        "projected": proj,
    }))


def run_chain(args, t_cfg, t_params) -> None:
    """Measured tokens/s of the on-device chain-speculation loop
    (speculative/chain.py): marginal cost between two scan lengths so
    the fixed remote dispatch cost cancels; tokens counted from the
    actual per-step acceptance. NOTE on synthetic weights: a layer-skip
    self-draft agrees with the full model almost always (random layers
    barely perturb the embedding-dominated residual), so acceptance is
    an UPPER bound; an unrelated random draft gives the 0-acceptance
    floor. Real-model acceptance lands between; the printed
    `tok_s_at_2x_needs_tokens_per_step` is the threshold to beat.
    """
    import statistics

    import jax
    import jax.numpy as jnp
    import numpy as np

    from powerserve_tpu.engine.loops import decode_scan
    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.speculative.chain import (
        chain_spec_sample_scan,
        chain_spec_scan,
        self_draft_config,
    )
    from powerserve_tpu.tools.bench_params import make_device_params

    tl = t_cfg.llm
    if args.self_draft_layers:
        dp, dl = t_params, self_draft_config(tl, args.self_draft_layers)
        draft_desc = f"self-draft-{args.self_draft_layers}L"
    else:
        d_cfg, dp = make_device_params(args.draft, "q4_k", seed=1)
        dl = d_cfg.llm
        draft_desc = args.draft
    if args.draft_rank:
        import dataclasses as _dc

        from powerserve_tpu.speculative.draft_head import make_draft_head

        dp = _dc.replace(dp, lm_head_lr=make_draft_head(
            dp.lm_head, rank=args.draft_rank))
        draft_desc += f"+lr{args.draft_rank}"

    def fresh(llm):
        return KVCache.create(llm.n_layers, 1, args.max_seq,
                              llm.n_kv_heads, llm.head_size, "int8")

    # vanilla baseline (same harness)
    def vanilla(n):
        kv = fresh(tl)
        toks, kv = decode_scan(t_params, jnp.zeros(1, jnp.int32), kv, tl,
                               n, "auto")
        np.asarray(toks)

    def spec(n):
        t_kv, d_kv = fresh(tl), fresh(dl)
        if args.tree:
            from powerserve_tpu.speculative.device_tree import (
                TreeTemplate,
                tree_spec_scan,
            )

            tpl = TreeTemplate.from_widths(
                [int(x) for x in args.tree.split(",")])
            S = 1
            mode = ("wor" if args.wor and args.temp > 0
                    else args.temp > 0)
            _, counts, *_ = tree_spec_scan(
                t_params, dp, t_kv, d_kv, jnp.zeros(S, jnp.int32) + 7,
                tl, dl, n, tpl.key(), "auto", sample=mode,
                rngs=jax.vmap(jax.random.PRNGKey)(jnp.arange(S)),
                temp=jnp.full(S, max(args.temp, 0.0), jnp.float32),
                top_k=jnp.full(S, 40, jnp.int32),
                top_p=jnp.full(S, 0.95, jnp.float32))
            return int(np.asarray(counts).sum()), n
        if args.temp > 0:
            S = 1
            _, counts, *_ = chain_spec_sample_scan(
                t_params, dp, t_kv, d_kv, jnp.zeros(S, jnp.int32) + 7,
                tl, dl, n, args.k, "auto",
                rngs=jax.vmap(jax.random.PRNGKey)(jnp.arange(S)),
                temp=jnp.full(S, args.temp, jnp.float32),
                top_k=jnp.full(S, 40, jnp.int32),
                top_p=jnp.full(S, 0.95, jnp.float32))
        else:
            _, counts, *_ = chain_spec_scan(
                t_params, dp, t_kv, d_kv, jnp.int32(7), tl, dl, n,
                args.k, "auto")
        return int(np.asarray(counts).sum()), n

    def marginal(fn, n1, n2, reps=3):
        fn(n1); fn(n2)
        ms = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(n1)
            t1 = time.perf_counter(); fn(n2)
            t2 = time.perf_counter()
            ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
        return statistics.median(ms)

    n1, n2 = max(args.steps // 4, 1), args.steps
    t_dec = marginal(lambda n: vanilla(n), n1, n2)
    base = 1.0 / t_dec

    tok1, _ = spec(n1)
    tok2, _ = spec(n2)
    t_step = marginal(lambda n: spec(n), n1, n2)
    tokens_per_step = (tok2 - tok1) / (n2 - n1)
    tok_s = tokens_per_step / t_step
    need = 2.0 * t_step / t_dec

    print(json.dumps({
        "metric": ("speculative_tree_tok_s" if args.tree
                   else "speculative_chain_tok_s"),
        "target": args.target, "draft": draft_desc, "k": args.k,
        "tree": args.tree or None, "wor": bool(args.wor and args.tree),
        "t_decode_ms": round(t_dec * 1e3, 2),
        "t_spec_step_ms": round(t_step * 1e3, 2),
        "tokens_per_step": round(tokens_per_step, 2),
        "baseline_tok_s": round(base, 1),
        "spec_tok_s": round(tok_s, 1),
        "speedup": round(tok_s / base, 2),
        "tok_s_at_2x_needs_tokens_per_step": round(need, 2),
    }))


def run_eagle(args, t_cfg, t_params) -> None:
    """Measured tokens/s of the on-device EAGLE chain loop
    (speculative/eagle.py) with a SYNTHETIC head: the target's own
    layer 0 behind an identity fc ([I; 0] — the head sees the raw
    feature). On random weights this is a HIGH-acceptance construction
    (like layer-skip self-drafting); a real trained head lands lower,
    so `tok_s_at_2x_needs_tokens_per_step` is the honest bar. The head
    costs ~1/L of a target step — far below even a 2-layer self-draft.
    """
    import dataclasses
    import statistics

    import jax
    import jax.numpy as jnp
    import numpy as np

    from powerserve_tpu.engine.loops import decode_scan
    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.models.loader import _qlinear_from_float
    from powerserve_tpu.speculative.eagle import EagleParams, eagle_spec_scan

    tl = t_cfg.llm
    dim = tl.dim
    if isinstance(t_params.layers, (tuple, list)):
        lw0 = t_params.layers[0]
    else:  # stacked [L, ...] leaves -> slice layer 0
        lw0 = jax.tree_util.tree_map(lambda a: a[0], t_params.layers)
    fcw = np.concatenate([np.eye(dim, dtype=np.float32),
                          np.zeros((dim, dim), np.float32)], axis=1)
    lr = None
    if args.draft_rank:
        from powerserve_tpu.speculative.draft_head import make_draft_head

        lr = make_draft_head(t_params.lm_head, rank=args.draft_rank)
    ep = EagleParams(fc=_qlinear_from_float(fcw, GGMLType.Q8_0),
                     fc_bias=None, layers=(lw0,), embed=t_params.embed,
                     lm_head=t_params.lm_head, out_norm=t_params.out_norm,
                     input_norm=True, lm_head_lr=lr)
    e_llm = dataclasses.replace(tl, n_layers=1)

    def fresh(llm):
        return KVCache.create(llm.n_layers, 1, args.max_seq,
                              llm.n_kv_heads, llm.head_size, "int8")

    def vanilla(n):
        kv = fresh(tl)
        toks, kv = decode_scan(t_params, jnp.zeros(1, jnp.int32), kv, tl,
                               n, "auto")
        np.asarray(toks)

    if args.tree:
        from powerserve_tpu.speculative.device_tree import TreeTemplate
        from powerserve_tpu.speculative.eagle import eagle_tree_spec_scan

        tpl = TreeTemplate.from_widths(
            [int(x) for x in args.tree.split(",")])

        def spec(n):
            t_kv, e_kv = fresh(tl), fresh(e_llm)
            _, counts, *_ = eagle_tree_spec_scan(
                t_params, ep, t_kv, e_kv, jnp.asarray([7], jnp.int32),
                jnp.zeros((1, dim), jnp.float32), tl, e_llm, n,
                tpl.key(), "auto")
            return int(np.asarray(counts).sum()), n
    else:
        def spec(n):
            t_kv, e_kv = fresh(tl), fresh(e_llm)
            _, counts, *_ = eagle_spec_scan(
                t_params, ep, t_kv, e_kv, jnp.asarray([7], jnp.int32),
                jnp.zeros((1, dim), jnp.float32), tl, e_llm, n, args.k,
                "auto")
            return int(np.asarray(counts).sum()), n

    def marginal(fn, n1, n2, reps=3):
        fn(n1); fn(n2)
        ms = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(n1)
            t1 = time.perf_counter(); fn(n2)
            t2 = time.perf_counter()
            ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
        return statistics.median(ms)

    n1, n2 = max(args.steps // 4, 1), args.steps
    t_dec = marginal(lambda n: vanilla(n), n1, n2)
    base = 1.0 / t_dec
    tok1, _ = spec(n1)
    tok2, _ = spec(n2)
    t_step = marginal(lambda n: spec(n), n1, n2)
    tokens_per_step = (tok2 - tok1) / (n2 - n1)
    tok_s = tokens_per_step / t_step
    need = 2.0 * t_step / t_dec

    print(json.dumps({
        "metric": ("speculative_eagle_tree_tok_s" if args.tree
                   else "speculative_eagle_tok_s"),
        "tree": args.tree or None,
        "target": args.target,
        "draft": "eagle-head-1L" + (f"+lr{args.draft_rank}"
                                    if args.draft_rank else ""),
        "k": args.k,
        "t_decode_ms": round(t_dec * 1e3, 2),
        "t_spec_step_ms": round(t_step * 1e3, 2),
        "tokens_per_step": round(tokens_per_step, 2),
        "baseline_tok_s": round(base, 1),
        "spec_tok_s": round(tok_s, 1),
        "speedup": round(tok_s / base, 2),
        "tok_s_at_2x_needs_tokens_per_step": round(need, 2),
    }))


if __name__ == "__main__":
    main()
