"""On-device chain speculative decoding.

The tree engine (speculative/engine.py) drives drafting from the host:
each tree level is a separate device dispatch, and over a remote-TPU
link every dispatch carries ~25ms of fixed latency — speculation can
never win there. This module is the TPU-native re-architecture: the
ENTIRE draft->verify->accept->commit cycle runs inside one jitted
lax.scan with fixed shapes, so N speculative steps cost one dispatch
(the reference's host loop, spec_model.hpp:96-113, replaced by
compiler-friendly control flow).

Chain drafting (one token per level — the reference's token tree with
width 1) keeps every KV position sequential, so acceptance needs no
gather-compaction: accepted entries are already at their final cache
positions and the losers roll back with one masked-rollback op.

Per speculative step, with draft length K:
  1. draft: K+1 sequential draft forwards (Tq=1) feeding
     [root, d0 .. d_{K-1}] — the last forward exists only to write
     d_{K-1}'s KV so the draft cache stays complete when all K drafts
     are accepted.
  2. verify: ONE target forward with Tq=K+1 over the fed chain
     (causal mask), sampled[i] = target argmax after chain[:i+1].
  3. accept: greedy longest prefix with d_i == sampled[i]
     (n_acc in [0, K]); step emits sampled[:n_acc+1].
  4. commit: both caches rollback(K - n_acc); the next root is
     sampled[n_acc].

Self-drafting (LayerSkip-style): pass the TARGET params with a config
whose n_layers is truncated — the layer scan just runs fewer slabs of
the same stacked weights, so the draft costs (ld/L) of a target step
and zero extra HBM.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LLMConfig, ModelConfig
from ..kv.cache import KVCache
from ..models.llama import LlamaParams, forward
from .engine import SpecStats

__all__ = ["chain_spec_scan", "chain_spec_sample_scan", "ChainSpecEngine",
           "self_draft_config"]

# draft-forward LAYER fusion (ops/fused.py): "auto" fuses layer chains
# for shallow (<= 4 layer) drafts, "on"/"off" force. The draft HEAD
# (out_norm + lr U/V + argmax) fuses regardless via forward's
# _FUSED_DECODE="head" default — measured the win for self-drafts.
_FUSE_DRAFT = _os.environ.get("POWERSERVE_FUSE_DRAFT", "auto")


def _draft_fuse(d_llm) -> bool | None:
    if _FUSE_DRAFT == "on":
        return True
    if _FUSE_DRAFT == "off":
        return None
    return d_llm.n_layers <= 4 or None


def self_draft_config(llm: LLMConfig, n_layers: int) -> LLMConfig:
    """Config for a layer-skip self-draft over the target's own stacked
    weights: the layer scan stops after `n_layers`, final norm and
    lm_head are shared."""
    if not 0 < n_layers <= llm.n_layers:
        raise ValueError(f"draft layers {n_layers} vs {llm.n_layers}")
    return dataclasses.replace(llm, n_layers=n_layers)


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "d_llm", "n_steps", "k", "backend"),
    donate_argnums=(2, 3),
)
def chain_spec_scan(tparams: LlamaParams, dparams: LlamaParams,
                    t_kv: KVCache, d_kv: KVCache, root: jax.Array,
                    t_llm: LLMConfig, d_llm: LLMConfig,
                    n_steps: int, k: int, backend: str = "auto"):
    """n_steps speculative chain steps in one dispatch.

    root: [] int32 — the last committed token (feeds the first draft).
    Returns (tokens [n_steps, k+1], counts [n_steps], t_kv, d_kv, root):
    step i emitted tokens[i, :counts[i]].
    """
    from ..engine import loops as _loops

    # window verify — see chain_spec_sample_scan (same scheme, greedy);
    # d_window = draft-side cache window (shares the verify's lane
    # positions/validity — chain drafting writes the same positions)
    use_window = (_loops._DECODE_LOOP_DEFAULT == "window"
                  and _loops.window_eligible(t_kv, tparams)
                  and n_steps * (k + 1) <= 1024)
    d_window = use_window and _loops.window_eligible(d_kv, dparams)
    S = t_kv.pos.shape[0]
    W = n_steps * (k + 1)
    lanes = jnp.arange(k + 1)
    # shallow drafts are launch-latency-bound: request the fused decode
    # chain (ops/fused.py) for them; deep drafts/targets stay on the
    # bandwidth-optimal bsum kernels (models/llama.py _FUSED_DECODE)
    d_fuse = _draft_fuse(d_llm)

    def spec_step(carry, i):
        if use_window:
            (t_pos, wins, valid, lane_pos), d_st, root = carry
            c = t_pos.astype(jnp.int32)
            base = i * (k + 1)
        else:
            t_kv_c, d_st, root = carry
            c = t_kv_c.pos.astype(jnp.int32)

        # -- 1. draft the chain: feed root, d0 .. d_{k-1} ------------------
        if d_window:
            d_pos0, d_wins = d_st

            def draft_body(dc, j):
                tok, dpos, dwins, dval = dc
                d_kvi = dataclasses.replace(d_kv, pos=dpos)
                nxt, kvo, blk = forward(
                    dparams, d_llm, d_kvi, tok[:, None],
                    dpos.astype(jnp.int32)[:, None], backend=backend,
                    logits_mode="argmax", kv_update="window",
                    inflight=dwins + (dval,), fuse_layers=d_fuse)
                dwins = _loops.push_kv_window(dwins, blk, base + j)
                dval = jax.lax.dynamic_update_slice(
                    dval, jnp.ones((S, 1), bool), (0, base + j))
                return (nxt, kvo.pos, dwins, dval), tok[0]

            (_, d_pos, d_wins, _), fed = jax.lax.scan(
                draft_body, (root[None], d_pos0, d_wins, valid),
                jnp.arange(k + 1))
        else:
            def draft_body(dc, _):
                tok, kv = dc
                pos = kv.pos.astype(jnp.int32)[:, None]
                nxt, kv = forward(dparams, d_llm, kv, tok[:, None], pos,
                                  backend=backend, logits_mode="argmax",
                                  fuse_layers=d_fuse)
                return (nxt, kv), tok[0]

            (_, d_kv_c), fed = jax.lax.scan(
                draft_body, (root[None], d_st), None, length=k + 1)
        # fed = [root, d0 .. d_{k-1}]; drafts are fed[1:]

        # -- 2. one target verify over the chain ---------------------------
        positions = c[:, None] + lanes[None, :]
        if use_window:
            kvi = dataclasses.replace(t_kv, pos=t_pos)
            sampled, _, blk = forward(tparams, t_llm, kvi, fed[None, :],
                                      positions, backend=backend,
                                      logits_mode="argmax_all",
                                      kv_update="window",
                                      inflight=wins + (valid,))
            wins = _loops.push_kv_window(wins, blk, base)
            lane_pos = jax.lax.dynamic_update_slice(
                lane_pos, positions, (0, base))
        else:
            sampled, t_kv_c = forward(tparams, t_llm, t_kv_c, fed[None, :],
                                      positions, backend=backend,
                                      logits_mode="argmax_all")
        sampled = sampled[0]  # [k+1] greedy target tokens

        # -- 3. greedy acceptance ------------------------------------------
        match = (sampled[:k] == fed[1:]).astype(jnp.int32)
        acc = jnp.cumprod(match)
        n_acc = jnp.sum(acc)  # in [0, k]
        new_root = jnp.take(sampled, n_acc)

        # -- 4. roll both caches back to the accepted prefix ---------------
        drop = jnp.int32(k) - n_acc
        if d_window:
            # rollback = the acceptance pass below invalidates this
            # step's rejected lanes (shared valid); only pos moves back
            d_st = ((c + n_acc + 1).astype(d_kv.pos.dtype), d_wins)
        else:
            d_st = d_kv_c.rollback(jnp.broadcast_to(drop, d_kv_c.pos.shape))
        if use_window:
            val_step = jnp.broadcast_to(lanes[None, :] <= n_acc, (S, k + 1))
            valid = jax.lax.dynamic_update_slice(valid, val_step, (0, base))
            t_pos = (c + n_acc + 1).astype(t_kv.pos.dtype)
            return ((t_pos, wins, valid, lane_pos), d_st,
                    new_root), (sampled, n_acc + 1)
        t_kv_c = t_kv_c.rollback(jnp.broadcast_to(drop, t_kv_c.pos.shape))
        return (t_kv_c, d_st, new_root), (sampled, n_acc + 1)

    if use_window:
        wins0 = _loops.make_kv_window(t_kv, t_llm, S, W)
        st0 = (t_kv.pos, wins0, jnp.zeros((S, W), bool),
               jnp.full((S, W), -1, jnp.int32))
        d_st0 = ((d_kv.pos, _loops.make_kv_window(d_kv, d_llm, S, W))
                 if d_window else d_kv)
        ((t_pos, wins, valid, lane_pos), d_st, root), (tokens, counts) = \
            jax.lax.scan(spec_step, (st0, d_st0, root), jnp.arange(n_steps))
        t_kv = _loops.commit_kv_lanes(t_kv, wins, lane_pos, valid,
                                      t_pos, t_kv.mask)
        if d_window:
            # draft lanes share the verify's positions and acceptance,
            # so the commit reuses lane_pos/valid verbatim
            d_pos_f, d_wins_f = d_st
            d_kv = _loops.commit_kv_lanes(d_kv, d_wins_f, lane_pos, valid,
                                          d_pos_f, d_kv.mask)
        else:
            d_kv = d_st
    else:
        (t_kv, d_kv, root), (tokens, counts) = jax.lax.scan(
            spec_step, (t_kv, d_kv, root), None, length=n_steps)
    return tokens, counts, t_kv, d_kv, root


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "d_llm", "n_steps", "k", "backend",
                     "tp_axis", "fwd_t", "fwd_d"),
    donate_argnums=(2, 3),
)
def chain_spec_sample_scan(tparams: LlamaParams, dparams: LlamaParams,
                           t_kv: KVCache, d_kv: KVCache, root: jax.Array,
                           t_llm: LLMConfig, d_llm: LLMConfig,
                           n_steps: int, k: int, backend: str = "auto",
                           active: jax.Array | None = None,
                           rngs: jax.Array | None = None,
                           temp: jax.Array | None = None,
                           top_k: jax.Array | None = None,
                           top_p: jax.Array | None = None,
                           tp_axis: str | None = None,
                           fwd_t=None, fwd_d=None):
    """Batched STOCHASTIC chain speculation: standard speculative
    sampling (Leviathan et al. 2023) instead of exact-match acceptance.

    The draft SAMPLES d_j ~ q_j (its own post-transform distribution
    with the slot's temp/top-k/top-p); the target verify accepts d_j
    with prob min(1, p_j(d_j)/q_j(d_j)) and on the first rejection
    resamples from the residual (p - q)^+ — the emitted stream is
    EXACTLY distributed as vanilla target sampling, while acceptance at
    temperature is 1 - TV(p, q) per position instead of p(argmax_q)
    (greedy-draft exact-match collapses on flat distributions: p
    uniform over 10 tokens accepts 10%; a matched sampled draft accepts
    ~100%). temp <= 0 slots degenerate to the greedy scheme exactly.
    The reference has no stochastic verification at all (greedy
    token_tree.cpp:213-229) — this is net-new.

    root [S]; rngs [S, 2] per-slot raw keys; temp/top_k/top_p [S].
    Returns (emitted [n_steps, S, k+1], counts [n_steps, S], t_kv,
    d_kv, root, rngs); emitted rows hold accepted drafts then the
    resampled/bonus token, -1 beyond counts.
    """
    from ..sampling.sampler import categorical_from_dist, sample_dist_batched

    # window verify (engine/loops.py): the target cache buffers stay
    # LOOP-INVARIANT — each verify's k+1 new K/V land in a carried
    # [n_steps*(k+1)]-lane window read by attention as a validity-
    # masked softmax partition; acceptance/rollback flip lane validity
    # (valid lanes always hold unique positions, so ONE post-scan
    # scatter commits). Avoids the carried-scatter cliff (+2-3 ms/step
    # at 8B cache sizes) the plain decode loop also dodges.
    from ..engine import loops as _loops

    # works under tp_axis too: the scan then runs inside the tp
    # shard_map (parallel/tp.py tp_chain_spec_scan), t_llm/d_llm hold
    # LOCAL head counts, and the window lanes are per-shard (heads
    # local) exactly like the cache shards they mirror
    use_window = (fwd_t is None
                  and _loops._DECODE_LOOP_DEFAULT == "window"
                  and _loops.window_eligible(t_kv, tparams)
                  and n_steps * (k + 1) <= 1024)
    # DRAFT-side window: the draft cache is also scan-carried and pays
    # the same carried-scatter cliff once its buffers reach 2^25 bytes
    # (a real 1B draft at batch does; layer-skip self-drafts are small
    # but take the same path for free). Chain drafting writes the same
    # positions as the verify (c .. c+k per step) and acceptance keeps
    # the same lane prefix, so the draft commit REUSES the target's
    # lane_pos/valid; only in-progress drafting needs incremental lane
    # validity (draft j must see lanes 0..j-1 of the current chain).
    d_window = use_window and _loops.window_eligible(d_kv, dparams)

    # fwd_t/fwd_d: injectable forward callables (static) — the pipeline
    # -parallel scheduler passes pp_forward partials so the whole spec
    # scan runs through the staged pipeline (spec x pp composition);
    # default is the plain forward with the tp shard_map axis threaded
    if fwd_t is None:
        fwd_t = functools.partial(forward, tp_axis=tp_axis)
    if fwd_d is None:
        # shallow drafts are launch-latency-bound: fused decode chain
        # (injected pp partials keep their own signature untouched)
        fwd_d = functools.partial(forward, tp_axis=tp_axis,
                                  fuse_layers=_draft_fuse(d_llm))

    S = root.shape[0]
    V = t_llm.vocab_size
    if active is None:
        active = jnp.ones(S, bool)
    if rngs is None:
        rngs = jnp.zeros((S, 2), jnp.uint32)
    lanes = jnp.arange(k + 1)
    W = n_steps * (k + 1)

    def spec_step(carry, i):
        if use_window:
            (t_pos, wins, valid, lane_pos), d_st, root, rngs = carry
            c = t_pos.astype(jnp.int32)
            base = i * (k + 1)
        else:
            t_kv_c, d_st, root, rngs = carry
            c = t_kv_c.pos.astype(jnp.int32)
        split = jax.vmap(lambda r: jax.random.split(r, 4))(rngs)
        new_rngs, draft_key, u_key, res_key = (split[:, 0], split[:, 1],
                                               split[:, 2], split[:, 3])

        # -- 1. draft k sampled tokens (k+1 forwards: the last only
        # writes d_{k-1}'s KV so the draft cache stays complete) -------
        if d_window:
            d_pos0, d_wins = d_st

            def draft_body(dc, j):
                tok, dpos, dwins, dval, dk = dc
                pos = jnp.where(active, dpos.astype(jnp.int32),
                                -1)[:, None]
                d_kvi = dataclasses.replace(d_kv, pos=dpos)
                logits, kvo, blk = fwd_d(
                    dparams, d_llm, d_kvi, tok[:, None], pos,
                    active=active, backend=backend, logits_mode="last",
                    kv_update="window", inflight=dwins + (dval,))
                dwins = _loops.push_kv_window(dwins, blk, base + j)
                # lane base+j becomes visible to drafts j+1.. (and the
                # acceptance pass overwrites this step's lanes below)
                dval = jax.lax.dynamic_update_slice(
                    dval, active[:, None], (0, base + j))
                sp = jax.vmap(lambda r: jax.random.split(r, 2))(dk)
                dk, sub = sp[:, 0], sp[:, 1]
                q = sample_dist_batched(logits[:, :V], temp, top_k,
                                        top_p, vocab_size=V)
                nxt = categorical_from_dist(sub, q).astype(jnp.int32)
                return (nxt, kvo.pos, dwins, dval, dk), (tok, q)

            (_, d_pos, d_wins, _, _), (fed_s, q_s) = jax.lax.scan(
                draft_body, (root, d_pos0, d_wins, valid, draft_key),
                jnp.arange(k + 1))
        else:
            d_kv_c = d_st

            def draft_body(dc, _):
                tok, kv, dk = dc
                pos = jnp.where(active, kv.pos.astype(jnp.int32),
                                -1)[:, None]
                logits, kv = fwd_d(dparams, d_llm, kv, tok[:, None], pos,
                                   active=active, backend=backend,
                                   logits_mode="last")
                sp = jax.vmap(lambda r: jax.random.split(r, 2))(dk)
                dk, sub = sp[:, 0], sp[:, 1]
                q = sample_dist_batched(logits[:, :V], temp, top_k, top_p,
                                        vocab_size=V)
                nxt = categorical_from_dist(sub, q).astype(jnp.int32)
                return (nxt, kv, dk), (tok, q)

            (_, d_kv_c, _), (fed_s, q_s) = jax.lax.scan(
                draft_body, (root, d_kv_c, draft_key), None, length=k + 1)
        fed = fed_s.T  # [S, k+1] = [root, d0 .. d_{k-1}] per slot
        q_dists = q_s.transpose(1, 0, 2)[:, :k]  # [S, k, V]; q_j drew d_j

        # -- 2. one batched target verify ------------------------------
        positions = jnp.where(active[:, None],
                              c[:, None] + lanes[None, :], -1)
        if use_window:
            kvi = dataclasses.replace(t_kv, pos=t_pos)
            logits, kvo, blk = fwd_t(
                tparams, t_llm, kvi, fed, positions, active=active,
                backend=backend, logits_mode="all",
                kv_update="window", inflight=wins + (valid,))
            wins = _loops.push_kv_window(wins, blk, base)
            lane_pos = jax.lax.dynamic_update_slice(
                lane_pos, c[:, None] + lanes[None, :], (0, base))
        else:
            logits, t_kv_c = fwd_t(tparams, t_llm, t_kv_c, fed, positions,
                                   active=active, backend=backend,
                                   logits_mode="all")
        rep = lambda a: jnp.repeat(a, k + 1, axis=0)  # noqa: E731
        p_dists = sample_dist_batched(
            logits.reshape(S * (k + 1), -1)[:, :V],
            rep(temp), rep(top_k), rep(top_p),
            vocab_size=V).reshape(S, k + 1, V)

        # -- 3. rejection-sample acceptance ----------------------------
        d = fed[:, 1:]  # [S, k] drafted tokens
        p_at_d = jnp.take_along_axis(
            p_dists[:, :k], d[:, :, None], axis=2)[:, :, 0]
        q_at_d = jnp.take_along_axis(
            q_dists, d[:, :, None], axis=2)[:, :, 0]
        u = jax.vmap(lambda r: jax.random.uniform(r, (k,)))(u_key)
        accept = (u * q_at_d < p_at_d).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(accept, axis=1), axis=1)  # [S]

        # -- 4. resample: residual (p - q)^+ at the reject position,
        # plain p at the bonus position (n_acc == k) -------------------
        p_sel = jnp.take_along_axis(
            p_dists, n_acc[:, None, None], axis=1)[:, 0]  # [S, V]
        q_pad = jnp.concatenate(
            [q_dists, jnp.zeros((S, 1, V), q_dists.dtype)], axis=1)
        q_sel = jnp.take_along_axis(
            q_pad, n_acc[:, None, None], axis=1)[:, 0]
        residual = jnp.maximum(p_sel - q_sel, 0.0)
        rsum = residual.sum(axis=-1, keepdims=True)
        residual = jnp.where(rsum > 1e-12, residual / jnp.maximum(rsum, 1e-30),
                             p_sel)
        new_root = categorical_from_dist(res_key, residual).astype(jnp.int32)
        new_root = jnp.where(active, new_root, root)

        emit = jnp.where(
            lanes[None, :] < n_acc[:, None],
            jnp.concatenate([d, jnp.zeros((S, 1), jnp.int32)], axis=1),
            jnp.where(lanes[None, :] == n_acc[:, None],
                      new_root[:, None], -1))
        emit = jnp.where(active[:, None], emit, -1)
        counts = jnp.where(active, n_acc + 1, 0)

        # -- 5. both caches keep the accepted prefix + the root entry --
        drop = jnp.where(active, k - n_acc, 0)
        if d_window:
            # rollback = the acceptance pass below invalidates this
            # step's rejected lanes (shared valid); only pos moves back
            d_st = (jnp.where(active, c + n_acc + 1,
                              c).astype(d_kv.pos.dtype), d_wins)
        else:
            d_st = d_kv_c.rollback(drop)
        if use_window:
            # rollback = invalidate this step's rejected lanes; the
            # accepted prefix's positions stay owned by their lanes
            val_step = (lanes[None, :] <= n_acc[:, None]) & active[:, None]
            valid = jax.lax.dynamic_update_slice(valid, val_step, (0, base))
            t_pos = jnp.where(active, c + n_acc + 1,
                              c).astype(t_kv.pos.dtype)
            return ((t_pos, wins, valid, lane_pos), d_st, new_root,
                    new_rngs), (emit, counts)
        t_kv_c = t_kv_c.rollback(drop)
        return (t_kv_c, d_st, new_root, new_rngs), (emit, counts)

    if use_window:
        wins0 = _loops.make_kv_window(t_kv, t_llm, S, W)
        st0 = (t_kv.pos, wins0, jnp.zeros((S, W), bool),
               jnp.full((S, W), -1, jnp.int32))
        d_st0 = ((d_kv.pos, _loops.make_kv_window(d_kv, d_llm, S, W))
                 if d_window else d_kv)
        ((t_pos, wins, valid, lane_pos), d_st, root, rngs), \
            (emitted, counts) = jax.lax.scan(
                spec_step, (st0, d_st0, root, rngs), jnp.arange(n_steps))
        t_kv = _loops.commit_kv_lanes(t_kv, wins, lane_pos, valid,
                                      t_pos, t_kv.mask)
        if d_window:
            # draft lanes share the verify's positions and acceptance,
            # so the commit reuses lane_pos/valid verbatim
            d_pos_f, d_wins = d_st
            d_kv = _loops.commit_kv_lanes(d_kv, d_wins, lane_pos, valid,
                                          d_pos_f, d_kv.mask)
        else:
            d_kv = d_st
    else:
        (t_kv, d_kv, root, rngs), (emitted, counts) = jax.lax.scan(
            spec_step, (t_kv, d_kv, root, rngs), None, length=n_steps)
    return emitted, counts, t_kv, d_kv, root, rngs


class ChainSpecEngine:
    """Host wrapper: prefill both models, then emit tokens in blocks of
    on-device speculative steps (one dispatch per block)."""

    def __init__(self, target_params: LlamaParams, target_cfg: ModelConfig,
                 draft_params: LlamaParams | None = None,
                 draft_cfg: ModelConfig | None = None,
                 self_draft_layers: int = 0, k: int = 4,
                 block_steps: int = 8, max_seq: int = 0,
                 kv_dtype: str = "int8", backend: str = "auto"):
        self.tp, self.tcfg = target_params, target_cfg
        if self_draft_layers:
            self.dp = target_params
            self.d_llm = self_draft_config(target_cfg.llm, self_draft_layers)
        else:
            assert draft_params is not None and draft_cfg is not None
            self.dp, self.d_llm = draft_params, draft_cfg.llm
        self.t_llm = target_cfg.llm
        self.k = k
        self.block_steps = block_steps
        self.backend = backend
        self.max_seq = max_seq or target_cfg.llm.seq_len
        self.kv_dtype = kv_dtype
        self.reset()

    def reset(self) -> None:
        t, d = self.t_llm, self.d_llm
        self.t_kv = KVCache.create(t.n_layers, 1, self.max_seq,
                                   t.n_kv_heads, t.head_size, self.kv_dtype)
        self.d_kv = KVCache.create(d.n_layers, 1, self.max_seq,
                                   d.n_kv_heads, d.head_size, self.kv_dtype)

    def prefill(self, prompt_tokens: list[int], chunk: int = 128) -> None:
        from ..engine.loops import prefill_step

        toks = np.asarray(prompt_tokens[:-1], np.int32)
        off = 0
        for off in range(0, len(toks), chunk):
            part = toks[off:off + chunk]
            pos = off + np.arange(len(part), dtype=np.int32)
            t = jnp.asarray(part[None, :])
            p = jnp.asarray(pos[None, :])
            _, self.t_kv = prefill_step(self.tp, t, p, self.t_kv,
                                        self.t_llm, self.backend)
            _, self.d_kv = prefill_step(self.dp, t, p, self.d_kv,
                                        self.d_llm, self.backend)
        self._root = jnp.int32(prompt_tokens[-1])

    def generate(self, prompt_tokens: list[int], n_predict: int,
                 stop_fn=None, stats: SpecStats | None = None):
        """Yield up to n_predict tokens, one device dispatch per
        `block_steps` speculative steps."""
        stats = stats if stats is not None else SpecStats()
        self.prefill(prompt_tokens)
        out = 0
        while out < n_predict:
            # capacity guard: a block writes up to block_steps*(k+1)
            # entries past the committed prefix
            room = self.max_seq - int(np.asarray(self.t_kv.pos)[0])
            if room < self.block_steps * (self.k + 1) + 1:
                return
            tokens, counts, self.t_kv, self.d_kv, self._root = \
                chain_spec_scan(self.tp, self.dp, self.t_kv, self.d_kv,
                                self._root, self.t_llm, self.d_llm,
                                self.block_steps, self.k, self.backend)
            tokens = np.asarray(tokens)
            counts = np.asarray(counts)
            for i in range(self.block_steps):
                stats.steps += 1
                stats.drafted += self.k
                stats.accepted += int(counts[i]) - 1
                for t in tokens[i, :counts[i]]:
                    stats.emitted += 1
                    out += 1
                    yield int(t)
                    if (stop_fn is not None and stop_fn(int(t))) \
                            or out >= n_predict:
                        return
