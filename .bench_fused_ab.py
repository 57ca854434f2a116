#!/usr/bin/env python
"""In-process A/B of the fused draft-head chain (ops/fused.py) on the
north-star spec config (8B Q4_K, self-draft 2L + lr512, k=3) and the
EAGLE chain (k=2 + lr512). Alternates fused/unfused inside ONE process
(the r4 tunnel-warm-up lesson: A-then-B process orders fake 8x).
Unfused = ops.fused._FUSED_DEFAULT monkeypatched off, with a distinct
backend string ("pallas" vs "auto" — same kernels) busting the jit
cache so both variants trace fresh."""
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
from powerserve_tpu.speculative.chain import chain_spec_scan, self_draft_config
from powerserve_tpu.speculative.draft_head import make_draft_head
from powerserve_tpu.speculative.eagle import EagleParams, eagle_spec_scan
from powerserve_tpu.tools.bench_params import make_device_params

K_CHAIN, K_EAGLE = 3, 2
MAXSEQ = 1024
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


def fresh(llm):
    return KVCache.create(llm.n_layers, 1, MAXSEQ, llm.n_kv_heads,
                          llm.head_size, "int8")


def chain_run(n, backend):
    t_kv, d_kv = fresh(tl), fresh(dl)
    _, counts, *_ = chain_spec_scan(tp, dp, t_kv, d_kv, jnp.int32(7),
                                    tl, dl, n, K_CHAIN, backend)
    return int(np.asarray(counts).sum())


def eagle_run(n, backend):
    t_kv, e_kv = fresh(tl), fresh(e_llm)
    _, counts, *_ = eagle_spec_scan(
        tp, ep, t_kv, e_kv, jnp.asarray([7], jnp.int32),
        jnp.zeros((1, tl.dim), jnp.float32), tl, e_llm, n, K_EAGLE,
        backend)
    return int(np.asarray(counts).sum())


def measure(run, backend, fused, n1=6, n2=24):
    F._FUSED_DEFAULT = fused
    run(n1, backend)
    run(n2, backend)
    t0 = time.perf_counter(); run(n1, backend)
    t1 = time.perf_counter(); run(n2, backend)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


out = {}
for name, run in (("chain_k3_lr512", chain_run),
                  ("eagle_k2_lr512", eagle_run)):
    # compile both variants first, then alternate warm pairs
    a, b = [], []
    for rep in range(3):
        a.append(measure(run, "auto", True))
        b.append(measure(run, "pallas", False))
    out[name] = {"fused_ms": round(statistics.median(a), 2),
                 "unfused_ms": round(statistics.median(b), 2),
                 "all_fused": [round(x, 2) for x in a],
                 "all_unfused": [round(x, 2) for x in b]}
    print(json.dumps({name: out[name]}), flush=True)
print(json.dumps(out))
