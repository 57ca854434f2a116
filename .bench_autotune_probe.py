"""Reduced autotune probe: sweep (bn, groups) for the two hottest 8B
decode shapes on device-native weights (skips the 165s GGUF load).
Uses tools.autotune._marginal_us (marginal-cost method)."""
import dataclasses
import jax
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.autotune import _marginal_us

cfg, params = make_device_params("llama-8b", "q4_k")
lw = params.layers
shapes = []
for f in ("wgu", "w_down", "wqkv", "wo"):
    lin = getattr(lw, f, None)
    if lin is None:
        continue
    if lin.q.ndim == 3:
        lin = dataclasses.replace(
            lin, q=lin.q[0], scales=lin.scales[0],
            bias=None if lin.bias is None else lin.bias[0])
    shapes.append((f, lin))

for name, lin in shapes:
    k, n = lin.in_features, lin.out_features
    best = None
    for bn in (512, 1024):
        if n % bn:
            continue
        for g in (2, 4, 8):
            try:
                us = _marginal_us(lin, 1, k, bn, g, reps=3)
            except Exception as e:
                print(f"{name} {k}x{n} bn={bn} g={g}: FAIL {type(e).__name__}", flush=True)
                continue
            print(f"{name} {k}x{n} bn={bn} g={g}: {us:7.1f} us", flush=True)
            if best is None or us < best[0]:
                best = (us, bn, g)
    if best:
        print(f"BEST {name} {k}x{n}: bn={best[1]} g={best[2]} {best[0]:.1f} us", flush=True)
