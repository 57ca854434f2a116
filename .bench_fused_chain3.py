#!/usr/bin/env python
"""3-way in-process A/B for the chain self-draft (8B, 2L + lr512,
k=3): draft layers fused + head fused / head-only fused / all unfused.
Variants toggled by monkeypatching chain._FUSE_DRAFT and
F._FUSED_DEFAULT at trace time, with distinct backend strings busting
the jit cache ("auto"/"pallas" both take the pallas kernels)."""
import dataclasses
import json
import statistics
import time

import jax.numpy as jnp
import numpy as np

import powerserve_tpu.ops.fused as F
import powerserve_tpu.speculative.chain as C
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.speculative.draft_head import make_draft_head
from powerserve_tpu.tools.bench_params import make_device_params

K = 3
MAXSEQ = 1024
cfg, tp = make_device_params("llama-8b", "q4_k")
tl = cfg.llm
dl = C.self_draft_config(tl, 2)
dp = dataclasses.replace(tp, lm_head_lr=make_draft_head(tp.lm_head, 512))


def fresh(llm):
    return KVCache.create(llm.n_layers, 1, MAXSEQ, llm.n_kv_heads,
                          llm.head_size, "int8")


def run(n, backend):
    t_kv, d_kv = fresh(tl), fresh(dl)
    _, counts, *_ = C.chain_spec_scan(tp, dp, t_kv, d_kv, jnp.int32(7),
                                      tl, dl, n, K, backend)
    return int(np.asarray(counts).sum())


VARIANTS = {
    # backend-string cache buster : (fused_default, fuse_draft_mode)
    "auto": (True, "on"),      # layers + head fused
    "pallas": (True, "off"),   # head-only fused
}


def measure(backend, n1=6, n2=24):
    fd, fm = VARIANTS[backend]
    F._FUSED_DEFAULT = fd
    C._FUSE_DRAFT = fm
    run(n1, backend)
    run(n2, backend)
    t0 = time.perf_counter(); run(n1, backend)
    t1 = time.perf_counter(); run(n2, backend)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


res = {k: [] for k in VARIANTS}
for rep in range(3):
    for k in VARIANTS:
        res[k].append(measure(k))
print(json.dumps({
    "layers+head": {"med": round(statistics.median(res["auto"]), 2),
                    "all": [round(x, 2) for x in res["auto"]]},
    "head_only": {"med": round(statistics.median(res["pallas"]), 2),
                  "all": [round(x, 2) for x in res["pallas"]]},
}))
