from powerserve_tpu.core.gguf import GGMLType
#!/usr/bin/env python
"""A/B the nibble-unpack convert chain inside the bsum Q4_K kernel:
u8 -> i32 -> f32 (current, Mosaic-safe) vs direct u8 -> f32 (one fewer
VPU pass per byte, if Mosaic accepts it). Marginal-cost scan method.
Also tries f32-via-bitcast-to-i8 (signed correction) as a third lane.
"""
import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import importlib
Q = importlib.import_module('powerserve_tpu.ops.qmatmul')

rng = np.random.default_rng(0)
K, N = 4096, 14336
lin = Q.QLinear.from_float(
    rng.standard_normal((K, N)).astype(np.float32) * 0.05,
    Q.GGMLType.Q4_K if hasattr(Q, "GGMLType") else 12)


def run(mode, iters=256):
    m = Q
    m._BSUM_VARIANT = mode

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x0, lin, n):
        def body(x, _):
            y = m.qmatmul(x, lin, backend="pallas")
            return (y[:, :K] * 1e-3).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x0, None, length=n)
        return x

    x0 = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    n1, n2 = iters // 4, iters
    np.asarray(loop(x0, lin, n1)); np.asarray(loop(x0, lin, n2))
    ms = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(loop(x0, lin, n1))
        t1 = time.perf_counter(); np.asarray(loop(x0, lin, n2))
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return statistics.median(ms) * 1e6


if __name__ == "__main__":
    from powerserve_tpu.core.gguf import GGMLType  # noqa
    for mode in (0, 1, 2, 0):
        try:
            us = run(mode)
            print(f"mode={mode}: {us:.1f} us")
        except Exception as e:
            print(f"mode={mode}: FAIL {type(e).__name__}: {str(e)[:200]}")
