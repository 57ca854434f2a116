#!/usr/bin/env python
"""In-kernel blocksum dequant for the fused decode kernels (r5):
does mul-only dequant + blocksum-correction dots flip the 'all'-fusion
verdict on the 32-layer main decode? Four variants alternated in one
process (distinct n_steps per variant pin each variant's trace-time
globals into its own jit cache entry; marginal method as usual):

  all+bsum  — fuse every layer matmul, in-kernel blocksum dequant
  all+fma   — fuse every layer matmul, per-element fma (r5 loser)
  head+bsum — default fusion scope, blocksum head kernel
  head+fma  — default fusion scope, fma head kernel (r5 default)
"""
import json
import statistics
import time

import jax.numpy as jnp
import numpy as np

import powerserve_tpu.models.llama as L
import powerserve_tpu.ops.fused as F
from powerserve_tpu.engine.loops import _decode_scan_window
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.tools.bench_params import make_device_params

cfg, params = make_device_params("llama-8b", "q4_k")
llm = cfg.llm
MAXSEQ = 1024


def run(n):
    kv = KVCache.create(llm.n_layers, 1, MAXSEQ, llm.n_kv_heads,
                        llm.head_size, "int8")
    toks, kv = _decode_scan_window(params, jnp.zeros(1, jnp.int32), kv,
                                   llm, n, "auto")
    return np.asarray(toks)


VARIANTS = {
    "all+bsum": ("all", True, 6, 30),
    "all+fma": ("all", False, 7, 31),
    "head+bsum": ("head", True, 8, 32),
    "head+fma": ("head", False, 9, 33),
}


def measure(name):
    mode, bsum, n1, n2 = VARIANTS[name]
    L._FUSED_DECODE = mode
    F._FUSED_BSUM = bsum
    run(n1); run(n2)  # compile (globals pinned at first trace)
    t0 = time.perf_counter(); run(n1)
    t1 = time.perf_counter(); run(n2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


out = {k: [] for k in VARIANTS}
for name in VARIANTS:  # compile everything up front
    measure(name)
for rep in range(4):
    for name in VARIANTS:
        out[name].append(round(measure(name), 3))
    print(json.dumps(out), flush=True)
print(json.dumps({k: round(statistics.median(v), 3)
                  for k, v in out.items()}))
