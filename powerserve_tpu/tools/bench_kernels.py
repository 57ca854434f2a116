"""Kernel microbenchmarks (honest over remote-TPU links).

Remote execution results can be served from a content cache when a
jitted call repeats with identical inputs, and block_until_ready does
not wait — so every timing here (a) chains state between iterations,
(b) salts the timed call differently from the warmup, and (c) syncs via
a host fetch. See CLAUDE.md "TPU-tunnel quirks".

Run: python -m powerserve_tpu.tools.bench_kernels [--iters 500]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGMLType
from ..ops.qmatmul import QLinear, qmatmul


def bench_qmatmul(fmt: int, K: int, N: int, M: int, iters: int,
                  backend: str = "pallas") -> dict:
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    lin = QLinear.from_float(w, fmt)
    qbytes = lin.nbytes()

    @jax.jit
    def run(x, lin, salt):
        x = x + salt * 1e-6

        w_dim = min(K, N)

        def body(c, _):
            y = qmatmul(c, lin, backend=backend)
            c = c.at[:, :w_dim].add(y[:, :w_dim].astype(c.dtype) * 1e-6)
            return c, ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    x = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.bfloat16)
    np.asarray(run(x, lin, jnp.float32(0)))  # compile + sync
    t0 = time.perf_counter()
    np.asarray(run(x, lin, jnp.float32(1)))
    dt = (time.perf_counter() - t0) / iters
    return {"fmt": GGMLType(fmt).name, "K": K, "N": N, "M": M,
            "us_per_call": round(dt * 1e6, 1),
            "GBps": round(qbytes / dt / 1e9, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
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
