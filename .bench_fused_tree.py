#!/usr/bin/env python
"""4-way in-process bisect of fused sections in the EAGLE tree
2,2,1,1 + lr512 spec step (8B Q4_K): (fuse_layers, fuse_head) for the
tree-scan head forwards. Variant selected by monkeypatching
eagle._TREE_FUSE at trace time; distinct t_kv max_seq shapes bust the
jit cache per variant."""
import dataclasses
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import powerserve_tpu.speculative.eagle as E
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.models.loader import _qlinear_from_float
from powerserve_tpu.speculative.device_tree import TreeTemplate
from powerserve_tpu.speculative.draft_head import make_draft_head
from powerserve_tpu.tools.bench_params import make_device_params

cfg, tp = make_device_params("llama-8b", "q4_k")
tl = cfg.llm
lw0 = jax.tree_util.tree_map(lambda a: a[0], tp.layers)
fcw = np.concatenate([np.eye(tl.dim, dtype=np.float32),
                      np.zeros((tl.dim, tl.dim), np.float32)], axis=1)
ep = E.EagleParams(fc=_qlinear_from_float(fcw, GGMLType.Q8_0),
                   fc_bias=None, layers=(lw0,), embed=tp.embed,
                   lm_head=tp.lm_head, out_norm=tp.out_norm,
                   input_norm=True,
                   lm_head_lr=make_draft_head(tp.lm_head, 512))
e_llm = dataclasses.replace(tl, n_layers=1)
tpl = TreeTemplate.from_widths([2, 2, 1, 1])

VARIANTS = {
    (True, True): 1024,
    (True, False): 1032,
    (False, True): 1040,
    (False, False): 1048,
}


def run(n, maxseq):
    t_kv = KVCache.create(tl.n_layers, 1, maxseq, tl.n_kv_heads,
                          tl.head_size, "int8")
    e_kv = KVCache.create(1, 1, maxseq, tl.n_kv_heads, tl.head_size,
                          "int8")
    _, counts, *_ = E.eagle_tree_spec_scan(
        tp, ep, t_kv, e_kv, jnp.asarray([7], jnp.int32),
        jnp.zeros((1, tl.dim), jnp.float32), tl, e_llm, n, tpl.key(),
        "auto")
    return int(np.asarray(counts).sum())


def measure(var, n1=6, n2=24):
    E._TREE_FUSE = var
    ms = VARIANTS[var]
    run(n1, ms)
    run(n2, ms)
    t0 = time.perf_counter(); run(n1, ms)
    t1 = time.perf_counter(); run(n2, ms)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


res = {v: [] for v in VARIANTS}
for rep in range(3):
    for v in VARIANTS:
        res[v].append(measure(v))
print(json.dumps({f"layers={v[0]},head={v[1]}":
                  {"med": round(statistics.median(r), 2),
                   "all": [round(x, 2) for x in r]}
                  for v, r in res.items()}))
