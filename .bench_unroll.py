#!/usr/bin/env python
"""Scan-overhead isolation (ROADMAP P0.1): per-layer cost of the
matmul-only 8B decode layer chain, as a stacked lax.scan at unroll
factors 1/2/4, vs the summed standalone kernel costs from the tuned
table. Marginal-cost method (two scan lengths, serial dependence).

If unroll>1 shows a real win, forward() grows a layer_unroll option.
"""
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.ops.qmatmul import qmatmul, load_tune_table
from powerserve_tpu.tools.bench_params import _rand_qlinear

L, DIM, FFN = 8, 4096, 14336  # L=8: full-size L=32 RESOURCE_EXHAUSTEDs the shared chip
QKV_N = (32 + 16) * 128  # 6144


def stacked(key, k, n):
    return jax.vmap(lambda kk: _rand_qlinear(kk, k, n, "q4_k"))(
        jax.random.split(key, L))


def main():
    import sys

    use_tune = "--tune" in sys.argv
    if use_tune:
        n = load_tune_table("/root/repo/qmm_tune_8b.json")
        print(f"loaded {n} tuned shapes", flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    wqkv = stacked(ks[0], DIM, QKV_N)
    wo = stacked(ks[1], DIM, DIM)
    wgu = stacked(ks[2], DIM, 2 * FFN)
    wdn = stacked(ks[3], FFN, DIM)
    x0 = jax.random.normal(jax.random.PRNGKey(9), (1, DIM), jnp.bfloat16)

    W = (wqkv, wo, wgu, wdn)

    def make_loop(unroll):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(W, x0, n):
            wqkv, wo, wgu, wdn = W

            def one_layer(x, idx):
                qkv = qmatmul(x, wqkv, backend="pallas", layer=idx)
                a = qmatmul(qkv[:, :DIM].astype(jnp.bfloat16), wo,
                            backend="pallas", layer=idx)
                x = x + a.astype(x.dtype) * 1e-6
                gu = qmatmul(x, wgu, backend="pallas", layer=idx)
                g = (gu[:, :FFN] * jax.nn.sigmoid(gu[:, :FFN])
                     * gu[:, FFN:])
                d = qmatmul(g.astype(jnp.bfloat16), wdn,
                            backend="pallas", layer=idx)
                return x + d.astype(x.dtype) * 1e-6

            def step(x, i):
                def body(carry, j):
                    return one_layer(carry, i * unroll + j), None

                x, _ = jax.lax.scan(body, x, jnp.arange(unroll))
                return x, None

            def whole(x, _):
                x, _ = jax.lax.scan(step, x, jnp.arange(L // unroll))
                return x, None

            x, _ = jax.lax.scan(whole, x0, None, length=n)
            return x.astype(jnp.float32).sum()

        return loop

    def make_unrolled_loop(unroll):
        """unroll as PYTHON unroll inside the outer scan step (no inner
        scan): trace-time repetition, one big body per outer step."""
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(W, x0, n):
            wqkv, wo, wgu, wdn = W

            def one_layer(x, idx):
                qkv = qmatmul(x, wqkv, backend="pallas", layer=idx)
                a = qmatmul(qkv[:, :DIM].astype(jnp.bfloat16), wo,
                            backend="pallas", layer=idx)
                x = x + a.astype(x.dtype) * 1e-6
                gu = qmatmul(x, wgu, backend="pallas", layer=idx)
                g = (gu[:, :FFN] * jax.nn.sigmoid(gu[:, :FFN])
                     * gu[:, FFN:])
                d = qmatmul(g.astype(jnp.bfloat16), wdn,
                            backend="pallas", layer=idx)
                return x + d.astype(x.dtype) * 1e-6

            def step(x, i):
                for j in range(unroll):
                    x = one_layer(x, i * unroll + j)
                return x, None

            def whole(x, _):
                x, _ = jax.lax.scan(step, x, jnp.arange(L // unroll))
                return x, None

            x, _ = jax.lax.scan(whole, x0, None, length=n)
            return x.astype(jnp.float32).sum()

        return loop

    def marginal_ms(loop, n1=8, n2=40, reps=5):
        np.asarray(loop(W, x0, n1)); np.asarray(loop(W, x0, n2))
        ms = []
        for _ in range(reps):
            t0 = time.perf_counter(); np.asarray(loop(W, x0, n1))
            t1 = time.perf_counter(); np.asarray(loop(W, x0, n2))
            t2 = time.perf_counter()
            ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
        return statistics.median(ms)

    for name, mk, u in (("scan-u1", make_loop, 1),
                        ("py-unroll-2", make_unrolled_loop, 2),
                        ("py-unroll-4", make_unrolled_loop, 4)):
        t0 = time.time()
        ms = marginal_ms(mk(u))
        print(f"{name}: {ms:.3f} ms / 32-layer matmul chain "
              f"({ms / L * 1e3:.1f} us/layer)  [{time.time()-t0:.0f}s wall]",
              flush=True)


if __name__ == "__main__":
    main()
