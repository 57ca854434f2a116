#!/usr/bin/env python
"""r5: serving-level cost of the paged pool's single-buffered ticks
(VERDICT r4 weakness 4 left it unmeasured): dense double-buffered
scheduler vs paged scheduler (pool ticks must fetch before page
decisions) at S=8, warm-pair alternation in one process. Pool sized so
no preemption occurs — the delta is pure tick-pipeline + paged-path
cost."""
import json
import threading
import time

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.engine.scheduler import BatchScheduler, Request
from powerserve_tpu.tools.bench_params import make_device_params

S = 8
GEN = 96
PROMPT = list(range(1, 129))


def run(sched):
    sched.start()
    done = threading.Event()
    sched.submit(Request(prompt_ids=[1, 2, 3], max_tokens=4,
                         temperature=0.0,
                         sink=lambda t: done.set() if t is None else None))
    assert done.wait(3600)
    dones = []
    t0 = time.perf_counter()
    for i in range(S):
        d = threading.Event()
        dones.append(d)
        sched.submit(Request(
            prompt_ids=PROMPT[: 64 + i], max_tokens=GEN, temperature=0.0,
            sink=lambda t, d=d: d.set() if t is None else None))
    for d in dones:
        assert d.wait(3600)
    dt = time.perf_counter() - t0
    sched.stop()
    return S * GEN / dt


def main() -> None:
    cfg, params = make_device_params("llama-8b", "q4_k")

    def dense():
        hp = HyperParams(max_slots=S, batch_size=128, max_seq_len=512)
        hp.decode_horizon = 8
        return BatchScheduler(params, cfg, hp, backend="auto")

    def paged():
        hp = HyperParams(max_slots=S, batch_size=128, max_seq_len=512)
        hp.decode_horizon = 8
        hp.paged_pages = 64  # 64 * 64 tok = ample, no preemption
        hp.page_size = 64
        return BatchScheduler(params, cfg, hp, backend="auto")

    out = {"metric": "serving_paged_warm_ab", "slots": S, "gen": GEN,
           "order": "d,p,d,p @h8 (dense double-buffered, pool single)"}
    for tag, mk in (("d1", dense), ("p1", paged),
                    ("d2", dense), ("p2", paged)):
        out[tag] = round(run(mk()), 1)
        if tag == "p2":
            out["warm_ratio"] = round(out["p2"] / out["d2"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
