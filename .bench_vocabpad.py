#!/usr/bin/env python
"""Does padding qwen's 151936 vocab (only bn=128 divides -> 1187
lm_head grid tiles) to 152064 (= 768*198) move the decode step?
Qwen2-0.5B preset: the lm_head is a large share of its tiny step.
Marginal decode-step method, stock vs padded-lm_head params."""
import dataclasses
import json
import statistics
import time

import jax.numpy as jnp
import numpy as np

from powerserve_tpu.engine.loops import decode_scan
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.ops.qmatmul import QLinear
from powerserve_tpu.tools.bench_params import make_device_params

cfg, params = make_device_params("qwen2-0.5b", "q4_0")
llm = cfg.llm


def pad_lm(lin: QLinear, mult: int = 768) -> QLinear:
    n = lin.q.shape[-1]
    pad = (-n) % mult
    if not pad:
        return lin
    q = jnp.pad(lin.q, ((0, 0), (0, pad)))
    s = jnp.pad(lin.scales, ((0, 0), (0, pad)))
    b = None if lin.bias is None else jnp.pad(lin.bias, ((0, 0), (0, pad)))
    return dataclasses.replace(lin, q=q, scales=s, bias=b,
                               out_features=n + pad)


def steptime(p, n1=16, n2=64, reps=3):
    def run(n):
        kv = KVCache.create(llm.n_layers, 1, 1024, llm.n_kv_heads,
                            llm.head_size, "int8")
        toks, _ = decode_scan(p, jnp.zeros(1, jnp.int32), kv, llm,
                              n, "auto")
        np.asarray(toks)
    run(n1); run(n2)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(n1)
        t1 = time.perf_counter(); run(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return round(statistics.median(ms), 3)


stock = steptime(params)
padded = steptime(dataclasses.replace(params, lm_head=pad_lm(params.lm_head)))
print(json.dumps({
    "metric": "qwen_vocab_pad_probe", "preset": "qwen2-0.5b",
    "stock_ms": stock, "padded_ms": padded,
    "tok_s_stock": round(1e3 / stock, 1),
    "tok_s_padded": round(1e3 / padded, 1),
}))
