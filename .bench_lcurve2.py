#!/usr/bin/env python
"""Post-window decode-step L-curve (8B Q4_K): step time vs n_layers
via self_draft_config truncation of the stacked weights. Slope =
marginal per-layer cost inside the window decode scan; intercept =
fixed per-step cost (embed + lm_head + sampling + scan/dispatch).
Marginal-cost method between two scan lengths."""
import statistics
import time

import jax.numpy as jnp
import numpy as np

from powerserve_tpu.engine.loops import decode_scan
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.speculative.chain import self_draft_config
from powerserve_tpu.tools.bench_params import make_device_params

cfg, params = make_device_params("llama-8b", "q4_k")
tl = cfg.llm


def step_ms(llm, steps=48):
    def run(n):
        kv = KVCache.create(llm.n_layers, 1, 1024, llm.n_kv_heads,
                            llm.head_size, "int8")
        toks, _ = decode_scan(params, jnp.zeros(1, jnp.int32), kv, llm,
                              n, "auto")
        np.asarray(toks)
    n1, n2 = steps // 4, steps
    run(n1); run(n2)
    ms = []
    for _ in range(3):
        t0 = time.perf_counter(); run(n1)
        t1 = time.perf_counter(); run(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return statistics.median(ms) * 1e3


pts = []
for L in (8, 16, 24, 32):
    llm = self_draft_config(tl, L) if L < tl.n_layers else tl
    t = step_ms(llm)
    pts.append((L, t))
    print(f"L={L}: {t:.2f} ms/step", flush=True)

xs = np.array([p[0] for p in pts], float)
ys = np.array([p[1] for p in pts], float)
slope, icept = np.polyfit(xs, ys, 1)
print(f"slope = {slope*1e3:.0f} us/layer, intercept = {icept:.2f} ms")
