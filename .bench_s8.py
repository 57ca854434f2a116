import time, statistics
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.engine.loops import decode_scan, prefill_step
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.tools.bench_params import make_device_params

cfg, params = make_device_params("llama-8b", "q4_k")
llm = cfg.llm

def steptime(S, n1=16, n2=64, reps=3):
    kv = KVCache.create(llm.n_layers, S, 1024, llm.n_kv_heads,
                        llm.head_size, dtype="int8")
    P = 128
    tokens = jnp.zeros((S, P), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (S, P))
    logits, kv = prefill_step(params, tokens, positions, kv, llm, "auto")
    np.asarray(jnp.argmax(logits))
    cur = jnp.zeros(S, jnp.int32)
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
    med = statistics.median(ms)
    print(f"S={S}: {med:.2f} ms/step marginal -> {S/med*1e3:.1f} tok/s agg"
          f"  (raw {[f'{m:.2f}' for m in ms]})", flush=True)

steptime(1)
steptime(8)
steptime(16)
