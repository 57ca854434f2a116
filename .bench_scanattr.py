import time, statistics, sys
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.engine.loops import decode_scan, prefill_step
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS

def steptime(preset, stacked=True, T=1024, n1=8, n2=32, reps=3):
    cfg, params = make_device_params(preset, "q4_k", stacked=stacked)
    llm = cfg.llm
    kv = KVCache.create(llm.n_layers, 1, T, llm.n_kv_heads,
                        llm.head_size, dtype="int8")
    P = 128
    tokens = jnp.zeros((1, P), jnp.int32)
    positions = jnp.arange(P, dtype=jnp.int32)[None, :]
    logits, kv = prefill_step(params, tokens, positions, kv, llm, "auto")
    np.asarray(jnp.argmax(logits))
    cur = jnp.zeros(1, jnp.int32)
    t, kv = decode_scan(params, cur, kv, llm, n1, "auto"); np.asarray(t)
    t, kv = decode_scan(params, cur, kv, llm, n2, "auto"); np.asarray(t)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter()
        t, kv = decode_scan(params, cur, kv, llm, n1, "auto"); np.asarray(t)
        t1 = time.perf_counter()
        t, kv = decode_scan(params, cur, kv, llm, n2, "auto"); np.asarray(t)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return statistics.median(ms)

base = dict(PRESETS["llama-8b"])
for L in (4, 12):
    p = dict(base); p["layers"] = L
    PRESETS[f"l{L}"] = p

def marginal(stacked, T):
    a = steptime("l4", stacked=stacked, T=T)
    b = steptime("l12", stacked=stacked, T=T)
    return a, b, (b - a) / 8 * 1e3  # us/layer

for label, st, T in (("scan T=1024", True, 1024),
                     ("unrolled T=1024", False, 1024),
                     ("scan T=4096", True, 4096)):
    a, b, us = marginal(st, T)
    print(f"{label}: L4={a:.2f}ms L12={b:.2f}ms -> {us:.0f} us/layer",
          flush=True)
