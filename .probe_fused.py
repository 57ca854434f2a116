#!/usr/bin/env python
"""Mosaic compile + correctness probe for ops/fused.py on the real
chip, at the exact 8B decode shapes. Each kernel compiles through the
remote helper (~20-60s) — keep the set minimal."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.ops.fused import fused_linear
from powerserve_tpu.ops.qmatmul import QLinear

rng = np.random.default_rng(0)


def mk(k, n, t=GGMLType.Q4_K):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    return QLinear.from_float(w, t)


def rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-9))


cases = []
dim, hd, ffn, V, r = 4096, 6144, 14336, 128256, 512
x = jnp.asarray(rng.standard_normal((1, dim)).astype(np.float32))
nw = jnp.asarray(rng.standard_normal((dim,)).astype(np.float32) * .1 + 1)
br = jnp.asarray(rng.standard_normal((1, dim)).astype(np.float32))

wqkv = mk(dim, hd)
cases.append(("norm+wqkv", wqkv, dict(norm=(x, nw))))
wo = mk(dim, dim)
cases.append(("wo", wo, dict(x=x)))
wgu = mk(dim, 2 * ffn)
cases.append(("norm2+wgu", wgu, dict(norm=(x, br, nw))))
wdn = mk(ffn, dim)
gu = jnp.asarray(rng.standard_normal((1, 2 * ffn)).astype(np.float32))
cases.append(("glu+down+res", wdn, dict(glu=gu, resids=(x, br))))
lm = mk(dim, V)
cases.append(("norm+lmhead+argmax", lm, dict(norm=(x, nw), argmax=True)))
fc = mk(2 * dim, dim)
cases.append(("concat2+fc+bias", fc, dict(
    parts=(x, br), bias=jnp.asarray(rng.standard_normal((dim,)).astype(np.float32)))))
u = mk(dim, r, GGMLType.Q8_0)
cases.append(("norm+U", u, dict(norm=(x, nw))))
v_w = rng.standard_normal((r, V)).astype(np.float32) * 0.02
vb = v_w.reshape(r // 32, 32, V)
vs = np.abs(vb).max(1) / 127.0
vq = np.clip(np.round(vb / np.maximum(vs, 1e-12)[:, None, :]), -127,
             127).astype(np.int8).reshape(r, V)
vlin = QLinear(q=jnp.asarray(vq), scales=jnp.asarray(vs.astype(np.float32)),
               bias=None, packed=False, unsigned=False, in_features=r,
               out_features=V, pack_group=0, scale_group=32)
hr = jnp.asarray(rng.standard_normal((1, r)).astype(np.float32))
cases.append(("V+argmax", vlin, dict(x=hr, argmax=True)))

only = sys.argv[1:] if len(sys.argv) > 1 else None
for name, lin, kw in cases:
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        a = np.asarray(fused_linear(lin, backend="pallas", **kw))
        b = np.asarray(fused_linear(lin, backend="xla", **kw))
        if kw.get("argmax"):
            print(f"{name}: tok {a[:4]} vs {b[:4]} "
                  f"match={bool((a == b).all())} "
                  f"({time.time()-t0:.1f}s)", flush=True)
        else:
            print(f"{name}: rel {rel(a, b):.2e} ({time.time()-t0:.1f}s)",
                  flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)
