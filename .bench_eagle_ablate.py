#!/usr/bin/env python
"""Find the ~2.5 ms/step unaccounted in the EAGLE chain step
(.bench_eagle_parts.py: parts sum 13.6 ms, full step 16.1 at k=2).
Rebuilds the greedy eagle_spec_scan step from the same pieces with
toggles, all inside one scan per variant (marginal method):

  full       — draft scan + window verify + acceptance + reprefill
  nodraft    — fed = fixed tokens (head scan removed entirely)
  noreprefill— commit eagle_forward removed (head cache goes stale —
               timing-only, results wrong)
  noaccept   — acceptance/new_root_feat replaced by constants
"""
import dataclasses
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.engine import loops as L
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.models.llama import forward
from powerserve_tpu.models.loader import _qlinear_from_float
from powerserve_tpu.speculative.eagle import EagleParams, eagle_forward
from powerserve_tpu.tools.bench_params import make_device_params

K = 2
MAXSEQ = 1024
cfg, t_params = make_device_params("llama-8b", "q4_k")
tl = cfg.llm
dim = tl.dim
lw0 = jax.tree_util.tree_map(lambda a: a[0], t_params.layers)
fcw = np.concatenate([np.eye(dim, dtype=np.float32),
                      np.zeros((dim, dim), np.float32)], axis=1)
ep = EagleParams(fc=_qlinear_from_float(fcw, GGMLType.Q8_0),
                 fc_bias=None, layers=(lw0,), embed=t_params.embed,
                 lm_head=t_params.lm_head, out_norm=t_params.out_norm,
                 input_norm=True)
e_llm = dataclasses.replace(tl, n_layers=1)
S, V = 1, tl.vocab_size
lanes = jnp.arange(K + 1)


@functools.partial(jax.jit, static_argnames=("n", "draft", "reprefill",
                                             "accept", "draft_lm",
                                             "unroll", "argmax_slice"))
def run(t_params, ep, t_kv, e_kv, n, draft=True, reprefill=True,
        accept=True, draft_lm=True, unroll=False, argmax_slice=0):
    W = n * (K + 1)
    wins0 = L.make_kv_window(t_kv, tl, S, W)

    def spec_step(carry, i):
        (t_pos, wins, valid, lane_pos), e_kv, root, root_feat = carry
        c = t_pos.astype(jnp.int32)
        base = i * (K + 1)

        if draft:
            def draft_body(dc, _):
                tok, feat, kv = dc
                pos = kv.pos.astype(jnp.int32)[:, None]
                logits, feat_out, kv = eagle_forward(
                    ep, e_llm, kv, tok[:, None], feat[:, None, :], pos,
                    backend="auto",
                    logits_mode="last" if draft_lm else "none")
                if draft_lm and argmax_slice:
                    # timing-only: argmax over a slice of the logits
                    nxt = jnp.argmax(logits[:, :argmax_slice],
                                     -1).astype(jnp.int32)
                elif draft_lm:
                    nxt = jnp.argmax(logits[:, :V], -1).astype(jnp.int32)
                else:
                    nxt = tok + 1  # timing-only: serial dep without lm_head
                return (nxt, feat_out[:, -1], kv), tok

            if unroll:
                dc = (root, root_feat, e_kv)
                toks = []
                for _ in range(K):
                    dc, t = draft_body(dc, None)
                    toks.append(t)
                last_tok, _, e_kv = dc
                fed_in = jnp.stack(toks)
            else:
                (last_tok, _, e_kv), fed_in = jax.lax.scan(
                    draft_body, (root, root_feat, e_kv), None, length=K)
            fed = jnp.concatenate([fed_in, last_tok[None, :]]).T
        else:
            fed = jnp.broadcast_to(root[:, None] + lanes[None, :],
                                   (S, K + 1)).astype(jnp.int32)

        positions = c[:, None] + lanes[None, :]
        kvi = dataclasses.replace(t_kv, pos=t_pos)
        logits, _, blk, feats = forward(
            t_params, tl, kvi, fed, positions, backend="auto",
            logits_mode="all", return_final_hidden=True,
            kv_update="window", inflight=wins + (valid,))
        wins = L.push_kv_window(wins, blk, base)
        lane_pos = jax.lax.dynamic_update_slice(lane_pos, positions,
                                                (0, base))
        feats = feats.astype(jnp.float32)
        sampled = jnp.argmax(logits[:, :, :V], -1).astype(jnp.int32)

        if accept:
            d = fed[:, 1:]
            match = (sampled[:, :K] == d).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
        else:
            n_acc = jnp.full((S,), K, jnp.int32)
        new_root = jnp.take_along_axis(sampled, n_acc[:, None],
                                       axis=1)[:, 0]
        new_root_feat = jnp.take_along_axis(
            feats, n_acc[:, None, None], axis=1)[:, 0]

        val_step = lanes[None, :] <= n_acc[:, None]
        valid2 = jax.lax.dynamic_update_slice(valid, val_step, (0, base))
        t_pos2 = (c + n_acc + 1).astype(t_pos.dtype)

        e_kv = e_kv.rollback(jnp.full((S,), K, jnp.int32))
        if reprefill:
            live = lanes[None, :] <= n_acc[:, None]
            commit_pos = jnp.where(live, c[:, None] + lanes[None, :], -1)
            commit_feats = jnp.concatenate(
                [root_feat[:, None, :], feats[:, :K]], axis=1)
            _, _, e_kv = eagle_forward(
                ep, e_llm, e_kv, fed, commit_feats, commit_pos,
                backend="auto", logits_mode="none")

        return ((t_pos2, wins, valid2, lane_pos), e_kv, new_root,
                new_root_feat), n_acc

    st0 = (t_kv.pos, wins0, jnp.zeros((S, W), bool),
           jnp.full((S, W), -1, jnp.int32))
    (_, _, root, _), accs = jax.lax.scan(
        spec_step, (st0, e_kv,
                    jnp.asarray([7], jnp.int32),
                    jnp.zeros((S, dim), jnp.float32)),
        jnp.arange(n))
    return root, accs.sum()


def fresh():
    return (KVCache.create(tl.n_layers, S, MAXSEQ, tl.n_kv_heads,
                           tl.head_size, "int8"),
            KVCache.create(1, S, MAXSEQ, tl.n_kv_heads, tl.head_size,
                           "int8"))


def marginal(kw, n1=8, n2=32, reps=3):
    def go(n):
        t_kv, e_kv = fresh()
        r, a = run(t_params, ep, t_kv, e_kv, n, **kw)
        np.asarray(r)
    go(n1); go(n2)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); go(n1)
        t1 = time.perf_counter(); go(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return round(statistics.median(ms), 2)


out = {"metric": "eagle_ablation_ms", "k": K}
out["full"] = marginal({})
out["nodraft"] = marginal({"draft": False})
# same, but the head gets PHYSICALLY SEPARATE copies of the shared
# lm_head/embed/out_norm buffers — if buffer sharing with the verify
# is what makes in-scan drafts 2.5x the solo cost, this restores it
ep_copy = jax.tree_util.tree_map(
    lambda a: a + jnp.zeros((), a.dtype) if hasattr(a, "dtype") else a, ep)
ep_orig = ep

def marginal2(kw, n1=8, n2=32, reps=3):
    def go(n):
        t_kv, e_kv = fresh()
        r, a = run(t_params, ep_copy, t_kv, e_kv, n, **kw)
        np.asarray(r)
    go(n1); go(n2)
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); go(n1)
        t1 = time.perf_counter(); go(n2)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return round(statistics.median(ms), 2)

out["argmax_4k"] = marginal({"argmax_slice": 4096})
print(json.dumps(out))
