import time, statistics, dataclasses
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.engine.scheduler import BatchScheduler
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.speculative.chain import self_draft_config

cfg, params = make_device_params("llama-8b", "q4_k")
llm = cfg.llm

def measure(S, spec, n1=8, n2=32, reps=3):
    hp = HyperParams(max_slots=S)
    hp.max_seq_len = 1024
    kw = {}
    if spec:
        kw = dict(draft_params=params, draft_llm=self_draft_config(llm, 2),
                  spec_k=4)
        hp.spec_horizon = 2
    sched = BatchScheduler(params, cfg, hp, "auto", **kw)
    # fill all slots with long-lived greedy requests
    from powerserve_tpu.engine.scheduler import Request
    reqs = []
    for i in range(S):
        r = Request(prompt_ids=[3, 5, 7, 11], max_tokens=10**9,
                    temperature=0.0)
        sched.submit(r)
        reqs.append(r)
    sched._admit()
    while sched._prefill_tick():
        pass
    def run(n):
        for _ in range(n):
            sched._decode_tick()
        np.asarray(sched.kv.pos)  # sync
    run(2)
    ms = []
    toks0 = sched.n_tokens_generated
    for _ in range(reps):
        t0 = time.perf_counter(); run(n1)
        t1 = time.perf_counter(); run(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    # token throughput: count tokens over a timed window
    t0 = time.perf_counter(); tk0 = sched.n_tokens_generated
    run(n2)
    dt = time.perf_counter() - t0
    tput = (sched.n_tokens_generated - tk0) / dt
    print(f"S={S} spec={spec}: {statistics.median(ms):.1f} ms/tick, "
          f"{tput if (tput:=tput) else 0:.0f} tok/s aggregate" if False else
          f"S={S} spec={spec}: {statistics.median(ms):.1f} ms/tick, "
          f"{tput:.0f} tok/s aggregate", flush=True)

measure(4, False)
measure(4, True)
measure(8, True)
