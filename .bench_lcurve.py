"""Step time vs layer count for the REAL decode_scan (llama-8b dims,
T=1024, marginal method). L4/L12 extrapolate to 11.1 ms at L=32 but the
measured L=32 step is ~14.3 ms — find where the curve leaves the line."""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.engine.loops import decode_scan, prefill_step
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS


import os

KVUP = os.environ.get("LCURVE_KV") or None
TDEF = int(os.environ.get("LCURVE_T", 1024))


def steptime(preset, T=TDEF, n1=8, n2=32, reps=3):
    cfg, params = make_device_params(preset, "q4_k", stacked=True)
    llm = cfg.llm
    kv = KVCache.create(llm.n_layers, 1, T, llm.n_kv_heads,
                        llm.head_size, dtype="int8")
    P = 128
    tokens = jnp.zeros((1, P), jnp.int32)
    positions = jnp.arange(P, dtype=jnp.int32)[None, :]
    logits, kv = prefill_step(params, tokens, positions, kv, llm, "auto")
    np.asarray(jnp.argmax(logits))
    cur = jnp.zeros(1, jnp.int32)

    def step(kv, n):
        t, kv = decode_scan(params, cur, kv, llm, n, "auto",
                            kv_update=KVUP)
        np.asarray(t)
        return kv

    kv = step(kv, n1); kv = step(kv, n2)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); kv = step(kv, n1)
        t1 = time.perf_counter(); kv = step(kv, n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return statistics.median(ms)


base = dict(PRESETS["llama-8b"])
import os

ffn = int(os.environ.get("LCURVE_FFN", 0))
if ffn:
    base["ffn"] = ffn  # capacity-vs-scan-length discriminator
ballast_mb = int(os.environ.get("LCURVE_BALLAST_MB", 0))
_ballast = None
if ballast_mb:  # total-HBM-ceiling vs weight-bytes-2^32 discriminator
    _ballast = jnp.zeros(ballast_mb * (1 << 20) // 4, jnp.float32)
    np.asarray(_ballast[:1])
Ls = [int(a) for a in sys.argv[1:]] or [16, 24, 32]
for L in Ls:
    p = dict(base); p["layers"] = L
    PRESETS[f"l{L}"] = p
    ms = steptime(f"l{L}")
    print(f"L={L}{' ffn=' + str(ffn) if ffn else ''}: {ms:.2f} ms/step  "
          f"({(ms - 0.73) / L * 1e3:.0f} us/layer after 0.73 ms head)",
          flush=True)
