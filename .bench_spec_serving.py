#!/usr/bin/env python
"""Serving-level speculation A/B (VERDICT r2 item 7): aggregate
generated tok/s through the REAL BatchScheduler (scheduler ticks, host
round trips, per-slot sampling) at S=4 — plain decode vs chain
self-draft speculation, same synthetic 8B Q4_K device params.

Synthetic-weights caveat (CLAUDE.md): layer-skip self-draft acceptance
on random weights is ~100%, so the spec number is an UPPER BOUND; the
printed acceptance metric is what a real checkpoint would discount.
"""
import threading
import time

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.engine.scheduler import BatchScheduler, Request
from powerserve_tpu.speculative.chain import self_draft_config
from powerserve_tpu.tools.bench_params import make_device_params

S = 4
GEN = 96
PROMPT = list(range(1, 129))


def run(sched) -> tuple[float, dict]:
    sched.start()
    # warmup: one short request compiles every jit
    done = threading.Event()
    sched.submit(Request(prompt_ids=[1, 2, 3], max_tokens=4,
                         temperature=0.0,
                         sink=lambda t: done.set() if t is None else None))
    assert done.wait(2400)
    dones = []
    t0 = time.perf_counter()
    for i in range(S):
        d = threading.Event()
        dones.append(d)
        sched.submit(Request(
            prompt_ids=PROMPT[: 64 + i], max_tokens=GEN, temperature=0.0,
            sink=lambda t, d=d: d.set() if t is None else None))
    for d in dones:
        assert d.wait(2400)
    dt = time.perf_counter() - t0
    m = sched.metrics()
    sched.stop()
    return S * GEN / dt, m


def main() -> None:
    cfg, params = make_device_params("llama-8b", "q4_k")
    hp = HyperParams(max_slots=S, batch_size=128, max_seq_len=512)
    hp.decode_horizon = 8
    sched = BatchScheduler(params, cfg, hp, backend="auto")
    print(f"[db={sched.double_buffer} horizon={sched.horizon} "
          f"window={sched.decode_window}]", flush=True)
    plain, _ = run(sched)
    print(f"plain serving S={S}: {plain:.1f} gen tok/s aggregate",
          flush=True)

    hp2 = HyperParams(max_slots=S, batch_size=128, max_seq_len=512)
    hp2.spec_horizon = 4
    spec, m = run(BatchScheduler(
        params, cfg, hp2, backend="auto", draft_params=params,
        draft_llm=self_draft_config(cfg.llm, 2), spec_k=3))
    print(f"chain-spec (self:2, k=3) serving S={S}: {spec:.1f} gen tok/s "
          f"aggregate ({spec / plain:.2f}x)", flush=True)
    print(f"  accept_rate={m.get('spec_accept_rate', 0):.3f} "
          f"tokens/step={m.get('spec_tokens_per_step', 0):.2f} "
          f"(synthetic weights: acceptance ~1.0 = upper bound)",
          flush=True)


if __name__ == "__main__":
    main()
