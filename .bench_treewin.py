#!/usr/bin/env python
"""r5 (VERDICT item 5): step-time delta from windowing the LAST two
carried caches — the device-tree DRAFT model cache and the EAGLE-tree
HEAD cache. Marginal method, variants alternated in one process
(distinct n_steps pin trace-time env reads per variant).

Configs at serving-scale batch (S=8, max_seq=4096) where the carried
buffers sit at/over the 2^25-byte carried-scatter cliff:
  - device-tree self-draft 2L, tree 2,2,1 (draft cache = target-sized
    slabs: 2 layers x 8 slots x 4096 tokens)
  - EAGLE tree 2,2,1,1 + lr512 (head cache 32 MB at S=8/T=4096)
"""
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
from powerserve_tpu.speculative.chain import self_draft_config
from powerserve_tpu.speculative.device_tree import (
    TreeTemplate,
    tree_spec_scan,
)
from powerserve_tpu.speculative.draft_head import make_draft_head
from powerserve_tpu.speculative.eagle import EagleParams, eagle_tree_spec_scan
from powerserve_tpu.tools.bench_params import make_device_params

S = 8
MAXSEQ = 4096
cfg, tp = make_device_params("llama-8b", "q4_k")
tl = cfg.llm
dl = self_draft_config(tl, 2)
dp = dataclasses.replace(tp, lm_head_lr=make_draft_head(tp.lm_head, 512))

lw0 = jax.tree_util.tree_map(lambda a: a[0], tp.layers)
fcw = np.concatenate([np.eye(tl.dim, dtype=np.float32),
                      np.zeros((tl.dim, tl.dim), np.float32)], axis=1)
ep = EagleParams(fc=_qlinear_from_float(fcw, GGMLType.Q8_0), fc_bias=None,
                 layers=(lw0,), embed=tp.embed, lm_head=tp.lm_head,
                 out_norm=tp.out_norm, input_norm=True,
                 lm_head_lr=dp.lm_head_lr)
e_llm = dataclasses.replace(tl, n_layers=1)

TREE_D = TreeTemplate.from_widths([2, 2, 1])
TREE_E = TreeTemplate.from_widths([2, 2, 1, 1])


def fresh(llm):
    return KVCache.create(llm.n_layers, S, MAXSEQ, llm.n_kv_heads,
                          llm.head_size, "int8")


def dtree_run(n):
    t_kv, d_kv = fresh(tl), fresh(dl)
    _, counts, *_ = tree_spec_scan(
        tp, dp, t_kv, d_kv, jnp.full(S, 7, jnp.int32), tl, dl, n,
        TREE_D.key(), "auto")
    return np.asarray(counts).sum()


def etree_run(n):
    t_kv, e_kv = fresh(tl), fresh(e_llm)
    _, counts, *_ = eagle_tree_spec_scan(
        tp, ep, t_kv, e_kv, jnp.full(S, 7, jnp.int32),
        jnp.zeros((S, tl.dim), jnp.float32), tl, e_llm, n,
        TREE_E.key(), "auto")
    return np.asarray(counts).sum()


VARIANTS = {
    "dtree_win": (dtree_run, "POWERSERVE_TREE_DRAFT_WINDOW", "1", 4, 16),
    "dtree_carry": (dtree_run, "POWERSERVE_TREE_DRAFT_WINDOW", "0", 5, 17),
    "etree_win": (etree_run, "POWERSERVE_EAGLE_HEAD_WINDOW", "1", 6, 18),
    "etree_carry": (etree_run, "POWERSERVE_EAGLE_HEAD_WINDOW", "0", 7, 19),
}


def measure(name):
    run, env, val, n1, n2 = VARIANTS[name]
    os.environ[env] = val
    run(n1); run(n2)
    t0 = time.perf_counter(); run(n1)
    t1 = time.perf_counter(); run(n2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


out = {k: [] for k in VARIANTS}
for name in VARIANTS:
    measure(name)  # compile (env pinned at first trace per n_steps)
for rep in range(4):
    for name in VARIANTS:
        out[name].append(round(measure(name), 3))
    print(json.dumps(out), flush=True)
print(json.dumps({k: round(statistics.median(v), 3)
                  for k, v in out.items()}))
