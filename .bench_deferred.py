import time, statistics, sys
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.engine.loops import decode_scan, prefill_step
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.tools.bench_params import make_device_params

def steptime(mode, T=1024, n1=8, n2=32, reps=3, preset="llama-8b"):
    cfg, params = make_device_params(preset, "q4_k", stacked=True)
    llm = cfg.llm
    kv = KVCache.create(llm.n_layers, 1, T, llm.n_kv_heads,
                        llm.head_size, dtype="int8")
    P = 128
    tokens = jnp.zeros((1, P), jnp.int32)
    positions = jnp.arange(P, dtype=jnp.int32)[None, :]
    logits, kv = prefill_step(params, tokens, positions, kv, llm, "auto", mode)
    np.asarray(jnp.argmax(logits))
    cur = jnp.zeros(1, jnp.int32)
    t, kv = decode_scan(params, cur, kv, llm, n1, "auto", mode); np.asarray(t)
    t, kv = decode_scan(params, cur, kv, llm, n2, "auto", mode); np.asarray(t)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter()
        t, kv = decode_scan(params, cur, kv, llm, n1, "auto", mode); np.asarray(t)
        t1 = time.perf_counter()
        t, kv = decode_scan(params, cur, kv, llm, n2, "auto", mode); np.asarray(t)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return statistics.median(ms)

for mode in ("inline", "deferred"):
    ms = steptime(mode)
    print(f"{mode} T=1024: {ms:.2f} ms/step ({1000/ms:.1f} tok/s)", flush=True)
