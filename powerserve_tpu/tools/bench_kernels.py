"""Kernel microbenchmarks (honest over remote-TPU links).

Remote execution has a large FIXED dispatch+fetch cost per program
(~25ms over the tunnel), block_until_ready does not wait, and XLA
hoists loop bodies with no serial dependence. So every timing here
(a) chains state between iterations (the op cannot be hoisted),
(b) measures MARGINAL cost between two scan lengths (fixed dispatch
    cost cancels), median of several reps,
(c) syncs via a host fetch. See CLAUDE.md "TPU-tunnel quirks".

Run: python -m powerserve_tpu.tools.bench_kernels [--iters 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGMLType
from ..ops.qmatmul import QLinear, qmatmul


def marginal_us(step_fn, carry0, n2: int, n1: int | None = None,
                reps: int = 5) -> float:
    """Median marginal cost (us/iteration) of step_fn inside a jitted
    lax.scan, measured as (t(n2) - t(n1)) / (n2 - n1) so the fixed
    per-program dispatch+fetch cost cancels. step_fn must chain its
    carry (serial dependence) or XLA hoists it out of the loop."""
    n1 = max(n2 // 8, 1) if n1 is None else n1

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(c, n):
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), ()), c, None,
                              length=n)
        return out

    sync = lambda r: jax.tree.map(np.asarray, r)  # noqa: E731
    sync(loop(carry0, n1))
    sync(loop(carry0, n2))
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(loop(carry0, n1))
        t1 = time.perf_counter()
        sync(loop(carry0, n2))
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return statistics.median(ms)


def bench_qmatmul(fmt: int, K: int, N: int, M: int, iters: int,
                  backend: str = "pallas") -> dict:
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    lin = QLinear.from_float(w, fmt)
    qbytes = lin.nbytes()
    w_dim = min(K, N)

    def step(c):
        y = qmatmul(c, lin, backend=backend)
        return c.at[:, :w_dim].add(y[:, :w_dim].astype(c.dtype) * 1e-6)

    x = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.bfloat16)
    us = marginal_us(step, x, iters)
    return {"fmt": GGMLType(fmt).name, "K": K, "N": N, "M": M,
            "us_per_call": round(us, 1),
            "GBps": round(qbytes / (us * 1e-6) / 1e9, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args(argv)
    cases = [
        (GGMLType.Q4_K, 4096, 14336, 1),
        (GGMLType.Q4_0, 4096, 14336, 1),
        (GGMLType.Q8_0, 4096, 14336, 1),
        (GGMLType.Q4_K, 4096, 14336, 16),
        (GGMLType.Q4_K, 4096, 6144, 1),
        (GGMLType.Q4_K, 14336, 4096, 1),
    ]
    for fmt, K, N, M in cases:
        print(json.dumps(bench_qmatmul(fmt, K, N, M, args.iters,
                                       args.backend)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
