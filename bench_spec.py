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


if __name__ == "__main__":
    main()
