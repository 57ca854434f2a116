#!/usr/bin/env python
"""Headline benchmark: 8B-class Q4 decode tokens/s on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference PowerServe Llama-3.1-8B Q4 decode on Snapdragon
8 Elite = 12.48 tok/s (BASELINE.md, reference README.md:25).

Method: device-native random Q4_K params (values irrelevant to timing),
prefill 128 tokens, then N greedy decode steps inside one jitted
lax.scan (token feedback on device). Timing waits on a host fetch of
the produced tokens, which is a true execution barrier even over
remote-TPU links where block_until_ready is unreliable.
"""

from __future__ import annotations

import argparse
import json
import time

# reference decode tok/s on Snapdragon 8 Elite (BASELINE.md, README.md:23-29)
BASELINES = {
    "llama-8b": 12.48,
    "llama-1b": 59.00,
    "qwen2-0.5b": 109.49,
    "qwen2.5-3b": 22.19,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama-8b")
    ap.add_argument("--quant", default="q4_k")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--prefill", type=int, default=512)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("-d", "--workspace", default=None,
                    help="measure the REAL path instead of device-native "
                         "random params: GGUF load+repack, tokenizer, "
                         "engine block-decode (end-to-end evidence; the "
                         "default mode isolates device step time)")
    args = ap.parse_args()

    if args.workspace:
        run_real(args)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from powerserve_tpu.engine.loops import decode_scan, prefill_step
    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params(args.preset, args.quant)
    llm = cfg.llm
    kv = KVCache.create(llm.n_layers, 1, args.max_seq, llm.n_kv_heads,
                        llm.head_size, dtype="int8")

    # ---- prefill ----
    # sync via a tiny host fetch (argmax token) — fetching full logits
    # pollutes timing over remote links
    P = args.prefill
    tokens = jnp.zeros((1, P), jnp.int32)
    positions = jnp.arange(P, dtype=jnp.int32)[None, :]
    logits, kv = prefill_step(params, tokens, positions, kv, llm,
                              args.backend)
    np.asarray(jnp.argmax(logits))  # warmup sync
    kv = kv.truncate(0)
    np.asarray(kv.pos)
    t0 = time.perf_counter()
    logits, kv = prefill_step(params, tokens, positions, kv, llm,
                              args.backend)
    np.asarray(jnp.argmax(logits))
    prefill_s = P / (time.perf_counter() - t0)

    # ---- decode ----
    cur = jnp.zeros(1, jnp.int32)
    toks, kv = decode_scan(params, cur, kv, llm, args.steps, args.backend)
    np.asarray(toks)  # warmup + sync
    t0 = time.perf_counter()
    toks, kv = decode_scan(params, cur, kv, llm, args.steps, args.backend)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    decode_tok_s = args.steps / dt

    baseline = BASELINES.get(args.preset, BASELINES["llama-8b"])
    print(json.dumps({
        "metric": f"decode_tok_s_{args.preset}_{args.quant}",
        "value": round(decode_tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(decode_tok_s / baseline, 2),
        "extra": {"prefill_tok_s": round(prefill_s, 1),
                  "steps": args.steps, "backend": args.backend,
                  "device": str(jax.devices()[0])},
    }))


def run_real(args) -> None:
    """End-to-end measurement over a real workspace: GGUF load+repack,
    tokenize, chunked prefill, block decode through InferenceEngine —
    the path a user actually runs (`powerserve-tpu run`)."""
    import numpy as np

    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.generator import GenerationStats, InferenceEngine
    from powerserve_tpu.models.loader import load_gguf_model
    from powerserve_tpu.tokenizer import Tokenizer

    t0 = time.perf_counter()
    cfg, params = load_gguf_model(args.workspace)
    import jax

    jax.block_until_ready(jax.tree.leaves(params)[0])
    np.asarray(jax.tree.leaves(params)[0].ravel()[0])  # true upload sync
    load_s = time.perf_counter() - t0

    tok = Tokenizer.from_model_dir(args.workspace)
    hp = HyperParams()
    hp.max_slots = 1
    hp.max_seq_len = args.max_seq
    hp.batch_size = args.prefill
    hp.decode_horizon = 16
    hp.sampler.temperature = 0.0
    engine = InferenceEngine(params, cfg, hp, backend=args.backend)

    text = ("The quick brown fox jumps over the lazy dog. " * 200)
    ids = tok.tokenize(text)[: args.prefill]
    t0 = time.perf_counter()
    n_tok = len(ids)
    tokenize_ms = (time.perf_counter() - t0) * 1e3

    stats = GenerationStats()
    out = [t for t in engine.generate(ids, args.steps, stats=stats)]
    # warm run measured; run once more for steady-state decode speed
    engine.reset()
    stats = GenerationStats()
    out = [t for t in engine.generate(ids, args.steps, stats=stats)]
    assert len(out) >= 1

    from pathlib import Path

    name = Path(args.workspace).resolve().name
    baseline = BASELINES.get(args.preset, BASELINES["llama-8b"])
    print(json.dumps({
        "metric": f"decode_tok_s_real_{name}_{args.quant}",
        "value": round(stats.decode_speed, 2),
        "unit": "tokens/s",
        "vs_baseline": round(stats.decode_speed / baseline, 2),
        "extra": {"prefill_tok_s": round(stats.prefill_speed, 1),
                  "load_s": round(load_s, 1),
                  "tokenize_ms": round(tokenize_ms, 2),
                  "prompt_tokens": n_tok,
                  "steps": args.steps, "backend": args.backend,
                  "real_path": True},
    }))


if __name__ == "__main__":
    main()
