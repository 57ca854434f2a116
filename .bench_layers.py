import time, statistics
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.engine.loops import decode_scan, prefill_step
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS

def steptime(preset, n1=16, n2=64, reps=3):
    cfg, params = make_device_params(preset, "q4_k")
    llm = cfg.llm
    kv = KVCache.create(llm.n_layers, 1, 1024, llm.n_kv_heads,
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
print("llama-8b preset:", base, flush=True)
for L in (8, 32):
    p = dict(base); p["layers"] = L
    PRESETS[f"l{L}"] = p
    ms = steptime(f"l{L}")
    print(f"layers={L}: {ms:.2f} ms/step", flush=True)
