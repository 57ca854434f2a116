#!/usr/bin/env python
"""MoE decode-batch dispatch A/B (VERDICT r4 item 7): qwen3moe-shaped
preset (E=128, top-8), S=8 decode — dense-all-experts (reads all 128
expert slabs per layer) vs grouped dispatch at bm=16 (reads at most
ceil(64/16) + 64 = 68). Marginal-cost decode steps."""
import json
import statistics
import time

import jax.numpy as jnp
import numpy as np

import powerserve_tpu.models.llama as LM
from powerserve_tpu.engine.loops import decode_scan
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.tools.bench_params import make_device_params

cfg, params = make_device_params("qwen3moe-lite", "q4_k")
llm = cfg.llm
S = 8


def steptime(dispatch, n1=12, n2=48, reps=3):
    LM._MOE_DISPATCH = dispatch
    # the dispatch choice bakes in at trace time — drop jit caches
    import powerserve_tpu.engine.loops as L
    for f in (L._decode_scan_window, L._decode_scan_carry
              if hasattr(L, "_decode_scan_carry") else None):
        if f is not None and hasattr(f, "clear_cache"):
            f.clear_cache()

    def run(n):
        kv = KVCache.create(llm.n_layers, S, 512, llm.n_kv_heads,
                            llm.head_size, "int8")
        t, _ = decode_scan(params, jnp.zeros(S, jnp.int32), kv, llm,
                           n, "auto")
        np.asarray(t)
    run(n1); run(n2)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(n1)
        t1 = time.perf_counter(); run(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return statistics.median(ms)


dense = steptime("dense")
grouped = steptime("grouped")
print(json.dumps({
    "metric": "moe_decode_dispatch_ab",
    "preset": "qwen3moe-lite(E=128,k=8)", "slots": S,
    "dense_ms": round(dense, 2), "grouped_ms": round(grouped, 2),
    "speedup": round(dense / grouped, 2),
}))
