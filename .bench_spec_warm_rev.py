#!/usr/bin/env python
"""VERDICT r4 item 2: WARM serving-level spec A/B of the north-star
config — plain decode vs chain self-draft (self:2, k=3, factored
draft head rank 512) through the REAL BatchScheduler, using the r4
alternation methodology: one process, configs alternated p,s,p,s so
the tunnel warm-up (first run in any process measures ~35 tok/s
regardless of config) is burned on the first pair and the WARM pair
(p2, s2) is the honest comparison. Double-buffered ticks stay on
(default). Repeated at S=4 and S=8.

Synthetic-weights caveat: self-draft acceptance on random weights is
~1.0, so the spec side is an upper bound; the acceptance metric line
is what a real checkpoint would discount (reference serving spec
ratios 1.75-2.07x, /root/reference/README.md:16-29).
"""
import dataclasses
import json
import threading
import time

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.engine.scheduler import BatchScheduler, Request
from powerserve_tpu.speculative.chain import self_draft_config
from powerserve_tpu.speculative.draft_head import make_draft_head
from powerserve_tpu.tools.bench_params import make_device_params

GEN = 96
PROMPT = list(range(1, 129))


def run(sched, S) -> tuple[float, dict]:
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
    m = sched.metrics()
    sched.stop()
    return S * GEN / dt, m


def main() -> None:
    cfg, params = make_device_params("llama-8b", "q4_k")
    print("[factoring draft head r=512 ...]", flush=True)
    dp = dataclasses.replace(
        params, lm_head_lr=make_draft_head(params.lm_head, rank=512))
    d_llm = self_draft_config(cfg.llm, 2)

    def plain(S):
        hp = HyperParams(max_slots=S, batch_size=128, max_seq_len=512)
        hp.decode_horizon = 8
        return BatchScheduler(params, cfg, hp, backend="auto")

    def spec(S):
        hp = HyperParams(max_slots=S, batch_size=128, max_seq_len=512)
        hp.spec_horizon = 4
        return BatchScheduler(params, cfg, hp, backend="auto",
                              draft_params=dp, draft_llm=d_llm, spec_k=3)

    for S in (8,):
        out = {"metric": "serving_spec_warm_ab", "slots": S, "gen": GEN,
               "config": "self:2 k=3 lr512 h4 vs plain h8, db on",
               "order": "s,p,s,p (REVERSED)"}
        for tag, mk in (("s1", spec), ("p1", plain),
                        ("s2", spec), ("p2", plain)):
            sched = mk(S)
            if tag == "s1":
                print(f"[S={S} db={sched.double_buffer} "
                      f"window={sched.decode_window}]", flush=True)
            tps, m = run(sched, S)
            out[tag] = round(tps, 1)
            if tag == "p2":
                out["warm_ratio"] = round(out["s2"] / out["p2"], 2)
                out["accept_rate"] = round(
                    m.get("spec_accept_rate", 0), 3)
                out["tok_per_step"] = round(
                    m.get("spec_tokens_per_step", 0), 2)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
