"""VLM batched-serving throughput probe (run on real TPU).

Measures aggregate serving throughput of the mm scheduler: S concurrent
requests whose prompts are precomputed embeddings (the vision-feature
overlay path) vs the same scheduler fed plain text requests — the delta
is the cost of the embedding-overlay prefill + host embed shipping.
Wall-clock over complete requests through the real scheduler loop
(includes host scheduling overhead — this is the serving number, not a
kernel number).

Env: BV_PRESET (default llama-8b), BV_QUANT (q4_k), BV_SLOTS (4),
BV_PROMPT (256), BV_GEN (64).
"""
import os
import queue
import time

import jax

if os.environ.get("JAX_PLATFORMS"):  # axon site plugin overrides the env
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.engine.scheduler import BatchScheduler, Request
from powerserve_tpu.tools.bench_params import make_device_params

PRESET = os.environ.get("BV_PRESET", "llama-8b")
QUANT = os.environ.get("BV_QUANT", "q4_k")
S = int(os.environ.get("BV_SLOTS", "4"))
P = int(os.environ.get("BV_PROMPT", "256"))
GEN = int(os.environ.get("BV_GEN", "64"))

cfg, params = make_device_params(PRESET, QUANT)
llm = cfg.llm
rng = np.random.default_rng(0)


def run(mm: bool) -> tuple[float, float]:
    hp = HyperParams(max_slots=S, batch_size=128, max_seq_len=P + GEN + 8,
                     prefix_cache=0)
    sched = BatchScheduler(params, cfg, hp, backend="auto",
                           mm_dim=llm.dim if mm else 0)
    done = queue.Queue()

    def submit():
        for i in range(S):
            ids = rng.integers(0, llm.vocab_size, P).tolist()
            emb = (rng.standard_normal((P, llm.dim)).astype(np.float32)
                   * 0.02) if mm else None
            sched.submit(Request(prompt_ids=ids, max_tokens=GEN,
                                 temperature=0.0, embeds=emb,
                                 sink=lambda t: done.put(1)
                                 if t is None else None))

    # warmup (compile)
    submit()
    for _ in range(100000):
        sched.step()
        if done.qsize() >= S:
            break
    while not done.empty():
        done.get()
    t0 = time.perf_counter()
    submit()
    n_done = 0
    while n_done < S:
        sched.step()
        while not done.empty():
            done.get()
            n_done += 1
    dt = time.perf_counter() - t0
    gen_tok_s = S * GEN / dt
    return gen_tok_s, dt


text_tps, text_dt = run(mm=False)
mm_tps, mm_dt = run(mm=True)
print(f"{PRESET} {QUANT} S={S} prompt={P} gen={GEN}:")
print(f"  text-only  : {text_tps:8.1f} gen tok/s agg ({text_dt:.2f}s)")
print(f"  embed(VLM) : {mm_tps:8.1f} gen tok/s agg ({mm_dt:.2f}s)  "
      f"overlay cost {100 * (text_dt and (mm_dt - text_dt) / text_dt):.1f}%",
      flush=True)
