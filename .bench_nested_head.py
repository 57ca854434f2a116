#!/usr/bin/env python
"""Is the 2.1 ms in-scan draft lm_head (vs 0.7 ms solo) caused by scan
NESTING? Three variants of k=2 head forwards per outer step, no verify:

  flat   — ONE scan of length n*k (the solo .bench_eagle_parts shape)
  nested — outer scan n, inner scan k (the eagle_spec_scan shape)
  nested_unroll — outer scan n, inner Python loop k (no inner scan)
"""
import dataclasses
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.models.loader import _qlinear_from_float
from powerserve_tpu.speculative.eagle import EagleParams, eagle_forward
from powerserve_tpu.tools.bench_params import make_device_params

K = 2
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
V = tl.vocab_size


def head_step(ep, tok, feat, kv):
    pos = kv.pos.astype(jnp.int32)[:, None]
    logits, feat_out, kv = eagle_forward(
        ep, e_llm, kv, tok[:, None], feat[:, None, :], pos,
        backend="auto", logits_mode="last")
    kv = kv.rollback(jnp.ones_like(kv.pos))
    nxt = jnp.argmax(logits[:, :V], -1).astype(jnp.int32)
    return nxt, feat_out[:, -1], kv


@functools.partial(jax.jit, static_argnames=("n", "mode"))
def run(ep, kv, n, mode):
    st0 = (jnp.zeros(1, jnp.int32), jnp.zeros((1, dim), jnp.float32), kv)
    if mode == "flat":
        def body(c, _):
            tok, feat, kv = c
            tok, feat, kv = head_step(ep, tok, feat, kv)
            return (tok, feat, kv), ()
        (tok, *_), _ = jax.lax.scan(body, st0, None, length=n * K)
        return tok

    def outer(c, _):
        tok, feat, kv = c
        if mode == "nested":
            def inner(ci, _):
                t, f, k_ = ci
                t, f, k_ = head_step(ep, t, f, k_)
                return (t, f, k_), ()
            (tok, feat, kv), _ = jax.lax.scan(inner, (tok, feat, kv),
                                              None, length=K)
        else:  # nested_unroll
            for _ in range(K):
                tok, feat, kv = head_step(ep, tok, feat, kv)
        return (tok, feat, kv), ()

    (tok, *_), _ = jax.lax.scan(outer, st0, None, length=n)
    return tok


def fresh():
    return KVCache.create(1, 1, 1024, tl.n_kv_heads, tl.head_size, "int8")


def marginal(mode, n1=8, n2=32, reps=3):
    def go(n):
        np.asarray(run(ep, fresh(), n, mode))
    go(n1); go(n2)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); go(n1)
        t1 = time.perf_counter(); go(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return round(statistics.median(ms), 2)


out = {"metric": "nested_head_ms_per_outer_step", "k": K}
for mode in ("flat", "nested", "nested_unroll"):
    out[mode] = marginal(mode)
print(json.dumps(out))
