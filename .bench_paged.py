"""Paged-vs-dense decode A/B (run on real TPU; marginal-cost method).

Measures the full 8B Q4_K decode step through forward() with
(a) the dense per-slot cache, (b) the paged pool via the XLA
whole-page gather, (c) the paged pool with flash_decode_paged
(scalar-prefetched page table; routes automatically at T >= 2048).
Reports us/step from the marginal cost between two scan lengths
(loop-invariant probes get hoisted; see CLAUDE.md micro-bench trap).
"""
import os
import statistics
import time

import jax

if os.environ.get("JAX_PLATFORMS"):  # axon site plugin overrides the env
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.engine.loops import decode_scan
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.kv.paged import PagedKVCache, PagePool
from powerserve_tpu.tools.bench_params import make_device_params

PRESET = os.environ.get("BP_PRESET", "llama-8b")
QUANT = os.environ.get("BP_QUANT", "q4_k")
cfg, params = make_device_params(PRESET, QUANT)
llm = cfg.llm


def mk_dense(S, T, pos):
    kv = KVCache.create(llm.n_layers, S, T, llm.n_kv_heads, llm.head_size,
                        "int8")
    return kv.advance(jnp.broadcast_to(jnp.arange(pos)[None], (S, pos)))


def mk_paged(S, T, pos, page):
    kv = PagedKVCache.create(llm.n_layers, S, T, llm.n_kv_heads,
                             llm.head_size, n_pages=S * (T // page) + 1,
                             page_size=page)
    pool = PagePool(kv.n_pages, S, kv.max_pages, page)
    for s in range(S):
        assert pool.ensure(s, T)
    kv = pool.flush(kv)
    return kv.advance(jnp.broadcast_to(jnp.arange(pos)[None], (S, pos)))


def marginal(kv_fn, S, T, pos, backend, n1=16, n2=48, reps=5):
    cur = jnp.zeros(S, jnp.int32)
    # warm compile both lengths
    t, kv = decode_scan(params, cur, kv_fn(), llm, n1, backend)
    np.asarray(t)
    t, kv = decode_scan(params, cur, kv_fn(), llm, n2, backend)
    np.asarray(t)
    ms = []
    for _ in range(reps):
        k1 = kv_fn()
        t0 = time.perf_counter()
        t, k1 = decode_scan(params, cur, k1, llm, n1, backend)
        np.asarray(t)
        t1 = time.perf_counter()
        k2 = kv_fn()
        t, k2 = decode_scan(params, cur, k2, llm, n2, backend)
        np.asarray(t)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return statistics.median(ms)


for S, T, page in [(1, 1024, 256), (8, 1024, 256), (1, 4096, 256),
                   (8, 4096, 256), (1, 4096, 64)]:
    pos = T - 128
    d = marginal(lambda: mk_dense(S, T, pos), S, T, pos, "auto")
    p = marginal(lambda: mk_paged(S, T, pos, page), S, T, pos, "xla")
    pf = marginal(lambda: mk_paged(S, T, pos, page), S, T, pos, "auto")
    print(f"S={S} T={T:5d} page={page:3d}: dense {d:8.1f}  "
          f"paged-gather {p:8.1f}  paged-flash {pf:8.1f} us/step",
          flush=True)
