#!/usr/bin/env python
"""On-chip autotune sweep over the 8B Q4_K weight shapes (CLAUDE.md
measurement checklist item 5), using device-native random QLinears so
no multi-GB host->device upload rides the tunnel. Writes
qmm_tune_8b.json, loadable via POWERSERVE_QMM_TUNE for bench.py.

Knob candidates are pruned to the reachable ones: decode (bm=16) allows
fat multi-group K tiles (groups up to 8 -> full-K at K=14336 via the
descending gpt loop in ops/qmatmul._qmatmul_pallas); prefill clamps
groups<=2. bn=512/1024 do not divide the 128256 lm_head.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from powerserve_tpu.tools.autotune import _marginal_us
from powerserve_tpu.tools.bench_params import _rand_qlinear
from powerserve_tpu.ops.qmatmul import mclass

# 8B q4_k shapes: wqkv, wo, w_down, wgu, lm_head
SHAPES = [(4096, 6144), (4096, 4096), (14336, 4096), (4096, 28672),
          (4096, 128256)]
BN = (256, 512, 1024)
G_DECODE = (1, 2, 8)
G_PREFILL = (1, 2)

def main() -> None:
    print(f"device: {jax.devices()[0]}", flush=True)
    table: dict[str, dict] = {}
    t_start = time.time()
    for k, n in SHAPES:
        key_lin = jax.random.PRNGKey(k * 131 + n)
        lin = _rand_qlinear(key_lin, k, n, "q4_k")
        for m in (1, 512):
            gcands = G_DECODE if m <= 16 else G_PREFILL
            best = None
            for bn in BN:
                if n % bn:
                    continue
                for g in gcands:
                    t0 = time.time()
                    try:
                        us = _marginal_us(lin, m, k, bn, g)
                    except Exception as e:  # noqa: BLE001
                        print(f"  {k}x{n} m={m} bn={bn} g={g}: FAIL {e!r}",
                              flush=True)
                        continue
                    print(f"  {k}x{n} m={m} bn={bn} g={g}: {us:.1f} us "
                          f"({time.time()-t0:.0f}s wall)", flush=True)
                    if best is None or us < best[0]:
                        best = (us, bn, g)
            if best is not None:
                key = f"{mclass(m)}:{k}:{n}"
                table[key] = {"bn": best[1], "groups": best[2],
                              "us": round(best[0], 2)}
                print(f"BEST {key}: {table[key]}", flush=True)
                with open("/root/repo/qmm_tune_8b.json", "w") as f:
                    json.dump(table, f, indent=1)
    print(f"done in {(time.time()-t_start)/60:.1f} min", flush=True)
    print(json.dumps(table, indent=1), flush=True)

if __name__ == "__main__":
    main()
