"""The L=32 decode cliff: step time jumps +2.1-2.9 ms above the
L<=31 trend at BOTH ffn=14336 and ffn=8192 (total bytes ruled out) —
something triggers at layer-scan trip count 32. Suspect: XLA:TPU
while-loop double buffering. A/B decode_scan with compiler options.

usage: python .bench_cliff.py '{"xla_tpu_enable_while_loop_double_buffering": "False"}'
"""
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.engine.loops import decode_scan, prefill_step
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.tools.bench_params import make_device_params

opts = json.loads(sys.argv[1]) if len(sys.argv) > 1 else None
T = 1024
cfg, params = make_device_params("llama-8b", "q4_k", stacked=True)
llm = cfg.llm
kv = KVCache.create(llm.n_layers, 1, T, llm.n_kv_heads, llm.head_size,
                    dtype="int8")
P = 128
tokens = jnp.zeros((1, P), jnp.int32)
positions = jnp.arange(P, dtype=jnp.int32)[None, :]
logits, kv = prefill_step(params, tokens, positions, kv, llm, "auto")
np.asarray(jnp.argmax(logits))
cur = jnp.zeros(1, jnp.int32)

n1, n2 = 8, 32
compiled = {}
for n in (n1, n2):
    low = decode_scan.lower(params, cur, kv, llm, n, "auto")
    compiled[n] = low.compile(compiler_options=opts) if opts \
        else low.compile()
    print(f"compiled n={n}", flush=True)


# donation consumes kv per call — re-create it each time (66 MB zeros)
def run(n):
    kvl = KVCache.create(llm.n_layers, 1, T, llm.n_kv_heads,
                         llm.head_size, dtype="int8")
    t, _ = compiled[n](params, cur, kvl)  # statics baked at lower()
    np.asarray(t)


run(n1); run(n2)
ms = []
for _ in range(5):
    t0 = time.perf_counter(); run(n1)
    t1 = time.perf_counter(); run(n2)
    t2 = time.perf_counter()
    ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
print(f"opts={opts}: {statistics.median(ms):.2f} ms/step", flush=True)
