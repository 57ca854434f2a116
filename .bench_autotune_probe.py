"""Reduced autotune probe: sweep (bn, groups) for the hottest 8B decode
shape (wgu 4096x28672) on device-native weights. Prints each config as
it completes (run WITHOUT pipe filters — grep buffering eats partial
output on timeout; learned r2s4)."""
import dataclasses
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.autotune import _marginal_us

cfg, params = make_device_params("llama-8b", "q4_k")
lin = params.layers.wgu
lin = dataclasses.replace(lin, q=lin.q[0], scales=lin.scales[0],
                          bias=None if lin.bias is None else lin.bias[0])
k, n = lin.in_features, lin.out_features
for bn, g in [(512, 2), (512, 4), (1024, 2), (512, 8)]:
    us = _marginal_us(lin, 1, k, bn, g, reps=3)
    gbs = (k * n / 2 + k * n / 32 * 2) / us / 1e3
    print(f"wgu {k}x{n} bn={bn} g={g}: {us:7.1f} us  {gbs:6.0f} GB/s",
          flush=True)
