#!/usr/bin/env python
"""Two leftover kernel probes on 4096x14336 Q4_K M=1 (f32-dot era):
(a) CostEstimate scaling (Mosaic pipeliner hint, x0.25/x1/x4),
(b) (bn, groups) re-sweep — the r3 autotune knee may have moved with
the f32-dot + bn-ladder changes. Marginal-scan method."""
import functools
import importlib
import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.core.gguf import GGMLType

Q = importlib.import_module("powerserve_tpu.ops.qmatmul")

rng = np.random.default_rng(0)
K, N = 4096, 14336
lin = Q.QLinear.from_float(
    rng.standard_normal((K, N)).astype(np.float32) * 0.05, GGMLType.Q4_K)


def measure(iters=256):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x0, lin, n):
        def body(x, _):
            y = Q.qmatmul(x, lin, backend="pallas")
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
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return round(statistics.median(ms), 1)


out = {"metric": "costscale_and_knob_probe", "shape": "4096x14336 M=1"}
for cs in ("0.25", "1", "4"):
    os.environ["POWERSERVE_COST_SCALE"] = cs
    jax.clear_caches()
    out[f"us_cost_x{cs}"] = measure()
    print(json.dumps(out), flush=True)
os.environ["POWERSERVE_COST_SCALE"] = "1"
for bn, g in ((512, 8), (768, 8), (512, 4), (512, 16), (256, 8)):
    Q._TUNE["decode:4096:14336"] = {"bn": bn, "groups": g}
    jax.clear_caches()
    out[f"us_bn{bn}_g{g}"] = measure()
    print(json.dumps(out), flush=True)
Q._TUNE.pop("decode:4096:14336", None)
