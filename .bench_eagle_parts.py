#!/usr/bin/env python
"""Decompose the EAGLE spec step (8B Q4_K, k configurable).

Marginal-cost method (CLAUDE.md micro-bench trap): every part runs in a
lax.scan with a serial token dependence; cost = (T(n2) - T(n1)) /
(n2 - n1) so fixed dispatch+fetch overhead cancels.

Parts:
  decode    — vanilla 1-token window-loop decode step (baseline)
  verify    — ONE target forward Tq=k+1, kv_update='window' (the spec
              verify without head/acceptance machinery)
  head_fwd  — one eagle head forward (Tq=1) incl. lm_head + argmax
              (the per-draft cost; a step pays k of these)
  head_nolm — same but logits_mode='none' (isolates the lm_head share)
  reprefill — eagle head forward Tq=k+1 logits_mode='none' (the
              post-acceptance true-feature re-prefill)
  full      — the real eagle_spec_scan step (bench_spec.py --mode eagle)
"""

import argparse
import dataclasses
import json
import statistics
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--target", default="llama-8b")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.engine import loops as L
    from powerserve_tpu.engine.loops import decode_scan
    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.models.llama import forward
    from powerserve_tpu.models.loader import _qlinear_from_float
    from powerserve_tpu.speculative.eagle import (
        EagleParams,
        eagle_forward,
        eagle_spec_scan,
    )
    from powerserve_tpu.tools.bench_params import make_device_params

    t_cfg, t_params = make_device_params(args.target, "q4_k")
    tl = t_cfg.llm
    dim = tl.dim
    k = args.k

    lw0 = jax.tree_util.tree_map(lambda a: a[0], t_params.layers)
    fcw = np.concatenate([np.eye(dim, dtype=np.float32),
                          np.zeros((dim, dim), np.float32)], axis=1)
    ep = EagleParams(fc=_qlinear_from_float(fcw, GGMLType.Q8_0),
                     fc_bias=None, layers=(lw0,), embed=t_params.embed,
                     lm_head=t_params.lm_head, out_norm=t_params.out_norm,
                     input_norm=True)
    e_llm = dataclasses.replace(tl, n_layers=1)

    def fresh(llm):
        return KVCache.create(llm.n_layers, 1, args.max_seq,
                              llm.n_kv_heads, llm.head_size, "int8")

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
    out = {"metric": "eagle_step_parts", "k": k}

    # baseline
    def dec(n):
        kv = fresh(tl)
        toks, _ = decode_scan(t_params, jnp.zeros(1, jnp.int32), kv, tl,
                              n, "auto")
        np.asarray(toks)
    out["decode_ms"] = round(marginal(dec, n1, n2) * 1e3, 2)

    # verify-only: Tq=k+1 window forwards in a scan, token chain serial
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def ver(params, kv, n):
        S, W = 1, n2 * (k + 1)
        wins0 = L.make_kv_window(kv, tl, S, W)
        lanes = jnp.arange(k + 1)

        def body(carry, i):
            tok, pos, wins, valid = carry
            c = pos.astype(jnp.int32)
            fed = jnp.broadcast_to(tok, (1, k + 1))
            positions = c[:, None] + lanes[None, :]
            kvi = dataclasses.replace(kv, pos=pos)
            logits, kvo, blk = forward(
                params, tl, kvi, fed, positions, backend="auto",
                logits_mode="all", kv_update="window",
                inflight=wins + (valid,))
            wins = L.push_kv_window(wins, blk, i * (k + 1))
            valid = jax.lax.dynamic_update_slice(
                valid, jnp.ones((S, k + 1), bool), (0, i * (k + 1)))
            nxt = jnp.argmax(logits[0, -1, :100], -1).astype(jnp.int32)
            return (nxt, kvo.pos, wins, valid), ()

        st = (jnp.zeros((), jnp.int32), kv.pos, wins0,
              jnp.zeros((S, W), bool))
        (tok, *_), _ = jax.lax.scan(body, st, jnp.arange(n))
        return tok

    def verify(n):
        kv = fresh(tl)
        np.asarray(ver(t_params, kv, n))
    out["verify_ms"] = round(marginal(verify, n1, n2) * 1e3, 2)

    # head forward Tq=1, with and without lm_head; serial token chain
    @functools.partial(jax.jit, static_argnames=("n", "mode"))
    def hfwd(ep, kv, n, mode):
        def body(carry, _):
            tok, feat, kv = carry
            pos = kv.pos.astype(jnp.int32)[:, None]
            logits, feat_out, kv = eagle_forward(
                ep, e_llm, kv, tok[:, None], feat[:, None, :], pos,
                backend="auto", logits_mode=mode)
            kv = kv.rollback(jnp.ones_like(kv.pos))  # keep size fixed
            if mode == "last":
                nxt = jnp.argmax(logits[:, :100], -1).astype(jnp.int32)
            else:
                nxt = tok + 1
            return (nxt, feat_out[:, -1], kv), ()
        st = (jnp.zeros(1, jnp.int32), jnp.zeros((1, dim), jnp.float32), kv)
        (tok, *_), _ = jax.lax.scan(body, st, None, length=n)
        return tok

    def head_full(n):
        np.asarray(hfwd(ep, fresh(e_llm), n, "last"))
    def head_nolm(n):
        np.asarray(hfwd(ep, fresh(e_llm), n, "none"))
    out["head_fwd_ms"] = round(marginal(head_full, n1 * 4, n2 * 4) * 1e3, 3)
    out["head_nolm_ms"] = round(marginal(head_nolm, n1 * 4, n2 * 4) * 1e3, 3)

    # re-prefill: Tq=k+1 head forward, logits off
    @functools.partial(jax.jit, static_argnames=("n",))
    def repre(ep, kv, n):
        def body(carry, _):
            tok, kv = carry
            fed = jnp.broadcast_to(tok, (1, k + 1))
            pos = kv.pos.astype(jnp.int32)[:, None] + jnp.arange(k + 1)
            feats = jnp.zeros((1, k + 1, dim), jnp.float32)
            _, fo, kv = eagle_forward(ep, e_llm, kv, fed, feats, pos,
                                      backend="auto", logits_mode="none")
            kv = kv.rollback(jnp.full_like(kv.pos, k + 1))
            return (tok + jnp.int32(fo[0, -1, 0] > 1e9), kv), ()
        (tok, _), _ = jax.lax.scan(body, (jnp.zeros(1, jnp.int32), kv),
                                   None, length=n)
        return tok

    def reprefill(n):
        np.asarray(repre(ep, fresh(e_llm), n))
    out["reprefill_ms"] = round(marginal(reprefill, n1 * 4, n2 * 4) * 1e3, 3)

    # full step
    def spec(n):
        t_kv, e_kv = fresh(tl), fresh(e_llm)
        _, counts, *_ = eagle_spec_scan(
            t_params, ep, t_kv, e_kv, jnp.asarray([7], jnp.int32),
            jnp.zeros((1, dim), jnp.float32), tl, e_llm, n, k, "auto")
        np.asarray(counts)
    out["full_step_ms"] = round(marginal(spec, n1, n2) * 1e3, 2)

    out["accounted_ms"] = round(
        out["verify_ms"] + k * out["head_fwd_ms"] + out["reprefill_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
