#!/usr/bin/env python
"""EAGLE head-cache window A/B at SERVING batch (S=8, T=4096): the
head cache's k/v buffers are [1, 8, 8, 4096, 128] int8 = 32 MB each —
past the 2^25-byte carried-scatter cliff — and the carried path
scatters them k+1 times per spec step. POWERSERVE_EAGLE_HEAD_WINDOW
gates the window (target verify stays windowed in both arms)."""
import dataclasses
import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.models.loader import _qlinear_from_float
from powerserve_tpu.speculative.eagle import EagleParams, eagle_spec_scan
from powerserve_tpu.tools.bench_params import make_device_params

S, K, MAXSEQ = 8, 2, 4096
cfg, t_params = make_device_params("llama-8b", "q4_k")
tl = cfg.llm
dim = tl.dim
lw0 = jax.tree_util.tree_map(lambda a: a[0], t_params.layers)
fcw = np.concatenate([np.eye(dim, dtype=np.float32),
                      np.zeros((dim, dim), np.float32)], axis=1)
ep = EagleParams(fc=_qlinear_from_float(fcw, GGMLType.Q8_0),
                 fc_bias=None, layers=(lw0,), embed=t_params.embed,
                 lm_head=t_params.lm_head, out_norm=t_params.out_norm,
                 input_norm=True)
e_llm = dataclasses.replace(tl, n_layers=1)


def fresh():
    return (KVCache.create(tl.n_layers, S, MAXSEQ, tl.n_kv_heads,
                           tl.head_size, "int8"),
            KVCache.create(1, S, MAXSEQ, tl.n_kv_heads, tl.head_size,
                           "int8"))


def spec(n):
    t_kv, e_kv = fresh()
    _, counts, *_ = eagle_spec_scan(
        t_params, ep, t_kv, e_kv, jnp.full((S,), 7, jnp.int32),
        jnp.zeros((S, dim), jnp.float32), tl, e_llm, n, K, "auto")
    np.asarray(counts)


def marginal(n1=6, n2=24, reps=3):
    spec(n1); spec(n2)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); spec(n1)
        t1 = time.perf_counter(); spec(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return round(statistics.median(ms), 2)


out = {"metric": "eagle_head_window_batch_ab", "slots": S, "k": K,
       "max_seq": MAXSEQ}
for mode, tag in (("0", "carry_head"), ("1", "window_head")):
    os.environ["POWERSERVE_EAGLE_HEAD_WINDOW"] = mode
    eagle_spec_scan.clear_cache()
    out[f"step_ms_{tag}"] = marginal()
    print(json.dumps(out), flush=True)
