#!/usr/bin/env python
"""lm_head N-tile count probe: 128256 = 2^8*3*167 so _pick_bn's
(512, 256, 128) ladder lands on bn=256 -> 501 grid tiles per lm_head
call; the eagle ablation suggests ~5 us/tile of in-scan overhead
(~2.4 ms per draft lm_head regardless of weight bytes). bn=768 (167
tiles) and bn=384 (334) divide evenly. Measures vanilla decode and the
eagle k=2 (factored-head) step with _TUNE overrides."""
import importlib
import json
import statistics
import time

import jax.numpy as jnp
import numpy as np

Q = importlib.import_module("powerserve_tpu.ops.qmatmul")

import dataclasses  # noqa: E402

import jax  # noqa: E402

from powerserve_tpu.core.gguf import GGMLType  # noqa: E402
from powerserve_tpu.engine.loops import decode_scan  # noqa: E402
from powerserve_tpu.kv.cache import KVCache  # noqa: E402
from powerserve_tpu.models.loader import _qlinear_from_float  # noqa: E402
from powerserve_tpu.speculative.draft_head import make_draft_head  # noqa: E402
from powerserve_tpu.speculative.eagle import (  # noqa: E402
    EagleParams,
    eagle_spec_scan,
)
from powerserve_tpu.tools.bench_params import make_device_params  # noqa: E402

cfg, t_params = make_device_params("llama-8b", "q4_k")
tl = cfg.llm
dim, V = tl.dim, tl.vocab_size
K = 2

lw0 = jax.tree_util.tree_map(lambda a: a[0], t_params.layers)
fcw = np.concatenate([np.eye(dim, dtype=np.float32),
                      np.zeros((dim, dim), np.float32)], axis=1)
u, v = make_draft_head(t_params.lm_head, rank=512)
ep = EagleParams(fc=_qlinear_from_float(fcw, GGMLType.Q8_0),
                 fc_bias=None, layers=(lw0,), embed=t_params.embed,
                 lm_head=t_params.lm_head, out_norm=t_params.out_norm,
                 input_norm=True, lm_head_lr=(u, v))
e_llm = dataclasses.replace(tl, n_layers=1)


def fresh(llm):
    return KVCache.create(llm.n_layers, 1, 1024, llm.n_kv_heads,
                          llm.head_size, "int8")


def marginal(fn, n1=8, n2=32, reps=3):
    fn(n1); fn(n2)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(n1)
        t1 = time.perf_counter(); fn(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return round(statistics.median(ms), 2)


def dec(n):
    kv = fresh(tl)
    toks, _ = decode_scan(t_params, jnp.zeros(1, jnp.int32), kv, tl,
                          n, "auto")
    np.asarray(toks)


def spec(n):
    t_kv, e_kv = fresh(tl), fresh(e_llm)
    _, counts, *_ = eagle_spec_scan(
        t_params, ep, t_kv, e_kv, jnp.asarray([7], jnp.int32),
        jnp.zeros((1, dim), jnp.float32), tl, e_llm, n, K, "auto")
    np.asarray(counts)


def clear():
    import powerserve_tpu.engine.loops as L

    L._decode_scan_window.clear_cache()
    eagle_spec_scan.clear_cache()


out = {"metric": "lmhead_bn_probe", "k": K}
for bn in (0, 768, 384):
    if bn:
        Q._TUNE[f"decode:{dim}:{V}"] = {"bn": bn}
        Q._TUNE[f"decode:512:{V}"] = {"bn": bn}
    else:
        Q._TUNE.pop(f"decode:{dim}:{V}", None)
        Q._TUNE.pop(f"decode:512:{V}", None)
    clear()
    tag = bn or "default256"
    out[f"decode_ms_bn{tag}"] = marginal(dec)
    out[f"eagle_lr_step_ms_bn{tag}"] = marginal(spec)
    print(json.dumps(out), flush=True)
