"""lm_head + wo re-tune with the fixed argument-passing _marginal_us."""
import json, time
import jax
from powerserve_tpu.tools.autotune import _marginal_us
from powerserve_tpu.tools.bench_params import _rand_qlinear
from powerserve_tpu.ops.qmatmul import mclass

table = json.load(open("/root/repo/qmm_tune_8b.json"))
jobs = [
    # lm_head: bn=256 only divides 128256
    (4096, 128256, 1, [(256, 1), (256, 2), (256, 8)]),
    (4096, 128256, 512, [(256, 1), (256, 2)]),
    # wo decode re-measure: 25.0-vs-14.8 on identical kernels = noise?
    (4096, 4096, 1, [(512, 8), (1024, 2), (1024, 8)]),
]
for k, n, m, cands in jobs:
    lin = _rand_qlinear(jax.random.PRNGKey(k * 131 + n), k, n, "q4_k")
    best = None
    for bn, g in cands:
        t0 = time.time()
        try:
            us = _marginal_us(lin, m, k, bn, g, reps=5)
        except Exception as e:
            print(f"{k}x{n} m={m} bn={bn} g={g}: FAIL {str(e)[:120]}",
                  flush=True)
            continue
        print(f"{k}x{n} m={m} bn={bn} g={g}: {us:.1f} us "
              f"({time.time()-t0:.0f}s)", flush=True)
        if best is None or us < best[0]:
            best = (us, bn, g)
    if best:
        key = f"{mclass(m)}:{k}:{n}"
        table[key] = {"bn": best[1], "groups": best[2],
                      "us": round(best[0], 2)}
        json.dump(table, open("/root/repo/qmm_tune_8b.json", "w"),
                  indent=1)
        print(f"BEST {key}: {table[key]}", flush=True)
