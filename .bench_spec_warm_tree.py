#!/usr/bin/env python
"""r5 follow-up to .bench_spec_warm.py: warm serving-level A/B of the
TREE spec config (self:2 draft, spec_tree 2,2,1, rank-512 factored
head — the r5 draft-side window applies to exactly this path) vs plain
decode, alternation methodology, S=8."""
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


def run(sched, S):
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
    S = 8

    def plain():
        hp = HyperParams(max_slots=S, batch_size=128, max_seq_len=512)
        hp.decode_horizon = 8
        return BatchScheduler(params, cfg, hp, backend="auto")

    def tree():
        hp = HyperParams(max_slots=S, batch_size=128, max_seq_len=512)
        hp.spec_horizon = 4
        hp.spec_tree = "2,2,1"
        return BatchScheduler(params, cfg, hp, backend="auto",
                              draft_params=dp, draft_llm=d_llm)

    out = {"metric": "serving_spec_tree_warm_ab", "slots": S, "gen": GEN,
           "config": "self:2 tree 2,2,1 lr512 h4 vs plain h8",
           "order": "p,s,p,s"}
    for tag, mk in (("p1", plain), ("s1", tree),
                    ("p2", plain), ("s2", tree)):
        tps, m = run(mk(), S)
        out[tag] = round(tps, 1)
        if tag == "s2":
            out["warm_ratio"] = round(out["s2"] / out["p2"], 2)
            out["tok_per_step"] = round(
                m.get("spec_tokens_per_step", 0), 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
