#!/usr/bin/env python
"""Re-verify the eagle chain k=2 + lr512 fused win with the max_seq
shape-bust method (4 interleaved reps), after the tree probe showed
the backend-string method can be confounded."""
import dataclasses
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import powerserve_tpu.ops.fused as F
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.models.loader import _qlinear_from_float
from powerserve_tpu.speculative.draft_head import make_draft_head
from powerserve_tpu.speculative.eagle import EagleParams, eagle_spec_scan
from powerserve_tpu.tools.bench_params import make_device_params

K = 2
cfg, tp = make_device_params("llama-8b", "q4_k")
tl = cfg.llm
lw0 = jax.tree_util.tree_map(lambda a: a[0], tp.layers)
fcw = np.concatenate([np.eye(tl.dim, dtype=np.float32),
                      np.zeros((tl.dim, tl.dim), np.float32)], axis=1)
ep = EagleParams(fc=_qlinear_from_float(fcw, GGMLType.Q8_0), fc_bias=None,
                 layers=(lw0,), embed=tp.embed, lm_head=tp.lm_head,
                 out_norm=tp.out_norm, input_norm=True,
                 lm_head_lr=make_draft_head(tp.lm_head, 512))
e_llm = dataclasses.replace(tl, n_layers=1)

VARIANTS = {True: 1024, False: 1032}


def run(n, maxseq):
    t_kv = KVCache.create(tl.n_layers, 1, maxseq, tl.n_kv_heads,
                          tl.head_size, "int8")
    e_kv = KVCache.create(1, 1, maxseq, tl.n_kv_heads, tl.head_size,
                          "int8")
    _, counts, *_ = eagle_spec_scan(
        tp, ep, t_kv, e_kv, jnp.asarray([7], jnp.int32),
        jnp.zeros((1, tl.dim), jnp.float32), tl, e_llm, n, K, "auto")
    return int(np.asarray(counts).sum())


def measure(fused, n1=6, n2=24):
    F._FUSED_DEFAULT = fused
    ms = VARIANTS[fused]
    run(n1, ms)
    run(n2, ms)
    t0 = time.perf_counter(); run(n1, ms)
    t1 = time.perf_counter(); run(n2, ms)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


res = {True: [], False: []}
for rep in range(4):
    for v in (True, False):
        res[v].append(measure(v))
print(json.dumps({
    "fused_ms": round(statistics.median(res[True]), 2),
    "unfused_ms": round(statistics.median(res[False]), 2),
    "all_fused": [round(x, 2) for x in res[True]],
    "all_unfused": [round(x, 2) for x in res[False]]}))
