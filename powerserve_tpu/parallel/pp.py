"""Pipeline parallelism: transformer layers sharded over a "pp" mesh
axis, activations flowing stage-to-stage over ICI.

Net-new vs the reference: its closest analogue is the NPU's sequential
context-binary chunks executed back-to-back on ONE device with host
memcpy between (SURVEY §2.3 "pipeline-ish model chunking" — a memory
split, not parallelism). Here each pp stage is a different chip holding
L/pp layers (weights AND that slice of the stacked KV cache), and the
inter-chunk host memcpy becomes a `lax.ppermute` of the residual
stream. This is the standard serving answer for models whose weights
exceed one chip's HBM when tensor parallelism is bandwidth-starved —
pp moves one [S*Tq, dim] activation per stage per step over ICI,
instead of tp's two psums per LAYER.

Execution model (SPMD, inside one jax.shard_map over "pp"):
  phase p = 0..pp-1: every stage runs its local layer scan on its
  resident activation, but only stage p's work is real — its KV writes
  are gated by `active` (others' scatters drop on -1 positions), then
  the residual ppermutes to stage p+1. Stage 0 ingests the embedding at
  phase 0; stage pp-1 holds the final hidden after phase pp-1, computes
  out_norm + lm_head, and a psum replicates the logits. The layer math
  is models/llama.py forward() itself (embeds= input,
  return_final_hidden= output), so pp inherits every numeric path —
  including the per-shard Pallas kernels, which GSPMD cannot partition.

This single-microbatch schedule is latency-equivalent to one chip plus
(pp-1) ppermute hops; prefill can pipeline M microbatches for
throughput (bubble fraction (pp-1)/(M+pp-1)) — see pp_prefill_microbatched.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import LLMConfig
from ..kv.cache import KVCache
from ..models.llama import LlamaParams, forward
from ..ops.elementwise import rms_norm
from ..ops.qmatmul import qmatmul
from .tp import _localize_params, _put_by_specs


# ---------------------------------------------------------------------------
# partition specs
# ---------------------------------------------------------------------------

def pp_param_specs(params: LlamaParams) -> LlamaParams:
    """Stacked layer leaves shard axis 0 ("pp"); embed / out_norm /
    lm_head replicate (stage 0 and pp-1 use them; the rest carry them
    idle — vocab tables could shard later)."""
    if isinstance(params.layers, (tuple, list)):
        raise ValueError("pipeline parallelism needs stacked layers "
                         "(load with stacked=True)")

    def leaf_spec(a):
        return None if a is None else P(*(("pp",) + (None,) * (a.ndim - 1)))

    layers = jax.tree.map(leaf_spec, params.layers)
    repl = jax.tree.map(lambda a: None if a is None else P(), params.embed)
    head = jax.tree.map(lambda a: None if a is None else P(),
                        params.lm_head)
    lr = None if params.lm_head_lr is None else jax.tree.map(
        lambda a: None if a is None else P(), params.lm_head_lr)
    return dataclasses.replace(params, layers=layers, embed=repl,
                               out_norm=P(), lm_head=head, lm_head_lr=lr)


def pp_kv_specs(kv: KVCache):
    """[L, S, H, T, D]: layers over pp (each stage holds its own
    slice's cache); mask/pos replicate — every stage advances its
    replica exactly once, during its own phase, so replicas agree.
    The paged pool shards the same way ([L, P, H, page, D] slabs;
    page table replicates — each stage maps the same logical pages
    onto its own layer slice of the pool)."""
    from ..kv.paged import PagedKVCache

    if isinstance(kv, PagedKVCache):
        kvs = P("pp", None, None, None, None)
        scs = P("pp", None, None, None)
        return PagedKVCache(k=kvs, v=kvs, k_scale=scs, v_scale=scs,
                            page_table=P(), mask=P(), pos=P(),
                            page_size=kv.page_size)
    kvs = P("pp", None, None, None, None)
    scs = P("pp", None, None, None) if kv.quantized else P()
    return KVCache(k=kvs, v=kvs, k_scale=scs, v_scale=scs,
                   mask=P(), pos=P(), quantized=kv.quantized)


def shard_params_pp(params: LlamaParams, mesh: Mesh,
                    cfg: LLMConfig) -> LlamaParams:
    pp = mesh.shape["pp"]
    L = jax.tree.leaves(params.layers)[0].shape[0]
    if L % pp:
        raise ValueError(f"{L} layers not divisible by pp={pp}")
    return _put_by_specs(params, pp_param_specs(params), mesh)


def shard_kv_pp(kv: KVCache, mesh: Mesh) -> KVCache:
    return _put_by_specs(kv, pp_kv_specs(kv), mesh)


# ---------------------------------------------------------------------------
# shard_map forward
# ---------------------------------------------------------------------------

def pp_window_specs() -> tuple:
    """PartitionSpecs for the in-flight decode window ([L, S, Hkv,
    W(, D)] — engine/loops.py::make_kv_window): layers shard over "pp"
    exactly like pp_kv_specs, so each stage's window lanes mirror its
    resident cache slice."""
    w = P("pp", None, None, None, None)
    s = P("pp", None, None, None)
    return (w, w, s, s)


def pp_forward(params: LlamaParams, llm: LLMConfig, kv: KVCache,
               tokens: jax.Array, positions: jax.Array, *,
               mesh: Mesh, active: jax.Array | None = None,
               backend: str = "auto", logits_mode: str = "last",
               embeds: jax.Array | None = None,
               use_embeds: jax.Array | None = None,
               kv_update: str | None = None,
               inflight: tuple | None = None,
               return_final_hidden: bool = False,
               cache_positions: jax.Array | None = None,
               intra_mask: jax.Array | None = None):
    """Pipelined forward: logits (replicated), updated kv (layer-
    sharded). Single microbatch — pp phases, one stage live per phase.

    return_final_hidden: append the last stage's final hidden states
    [S, Tq, dim] f32 (psum-replicated) to the outputs — the EAGLE
    feature stream (eagle x pp: the head runs replicated on every
    stage off these features).

    cache_positions / intra_mask: tree-verify semantics (models/
    llama.py forward) — rope positions stay `positions`, the KV
    scatters land at cache_positions, and intra_mask carries the
    ancestor matrix (eagle x pp TREE templates).

    embeds/use_embeds: optional per-slot embedding overlay (the VLM
    prefill path — scheduler mm_prefill_chunk): slots flagged in
    use_embeds [S] take their stage-0 input rows from embeds
    [S, Tq, dim] (replicated over pp) instead of the token table.

    kv_update="window" + inflight: the pp tick of the WINDOW decode
    loop (engine/loops.py) — each stage's cache slice stays
    loop-invariant (the carried-scatter cliff applies per stage slice
    exactly like on one chip), the new K/V block comes back layer-
    sharded as a third output for the caller's window push, and the
    caller commits once post-loop. Every stage computes a block each
    phase, but only the block from the stage's OWN phase (the one fed
    by the real residual) is kept.
    """
    # embeds/use_embeds share one in_spec and are read together in the
    # body — a lone embeds would crash on use_embeds[:, None, None]
    assert (embeds is None) == (use_embeds is None), \
        "pass embeds and use_embeds together (or neither)"
    pp = mesh.shape["pp"]
    window = kv_update == "window"
    assert not window or inflight is not None, \
        "pp window ticks need inflight"
    pspecs = pp_param_specs(params)
    kspecs = pp_kv_specs(kv)
    act_spec = None if active is None else P()
    emb_spec = None if embeds is None else P()
    S = tokens.shape[0]
    Tq = tokens.shape[1]
    if window:
        # filled indicator (scalar lane count or [S, W] validity)
        # replicates — pp shards neither slots nor lanes
        win_specs = pp_window_specs() + (P(),)

    def body(params, kv, tokens, positions, active, embeds, use_embeds,
             inflight, cache_positions, intra_mask):
        params = _localize_params(params)
        s = jax.lax.axis_index("pp")
        act = jnp.ones(S, bool) if active is None else active
        x0 = params.embed.lookup(tokens).astype(jnp.bfloat16)
        if embeds is not None:
            x0 = jnp.where(use_embeds[:, None, None],
                           embeds.astype(jnp.bfloat16), x0)
        L_loc = kv.k.shape[0]
        Hkv, D = llm.n_kv_heads, llm.head_size

        def phase(carry, p):
            x_res, x_final, kv, blk = carry
            work = act & (s == p)
            pos_p = jnp.where(work[:, None], positions, -1)
            cpos_p = (None if cache_positions is None
                      else jnp.where(work[:, None], cache_positions, -1))
            if window:
                _, kv, blk_new, x_out = forward(
                    params, llm, kv, tokens, pos_p, active=work,
                    cache_positions=cpos_p, intra_mask=intra_mask,
                    embeds=x_res, backend=backend, logits_mode="none",
                    return_final_hidden=True, kv_update="window",
                    inflight=inflight)
                blk = jax.tree.map(
                    lambda o, n: jnp.where(p == s, n.astype(o.dtype), o),
                    blk, blk_new)
            else:
                _, kv, x_out = forward(
                    params, llm, kv, tokens, pos_p, active=work,
                    cache_positions=cpos_p, intra_mask=intra_mask,
                    embeds=x_res, backend=backend, logits_mode="none",
                    return_final_hidden=True)
            mine = jnp.logical_and(p == pp - 1, s == pp - 1)
            x_final = jnp.where(mine, x_out.astype(jnp.float32), x_final)
            x_next = jax.lax.ppermute(
                x_out, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return (x_next, x_final, kv, blk), None

        blk0 = (jnp.zeros((L_loc, S, Hkv, Tq, D), kv.k.dtype),
                jnp.zeros((L_loc, S, Hkv, Tq, D), kv.v.dtype),
                jnp.zeros((L_loc, S, Hkv, Tq), kv.k_scale.dtype),
                jnp.zeros((L_loc, S, Hkv, Tq), kv.v_scale.dtype))
        x_final0 = jnp.zeros(x0.shape, jnp.float32)
        (_, x_final, kv, blk), _ = jax.lax.scan(
            phase, (x0, x_final0, kv, blk0), jnp.arange(pp))
        # only the last stage holds the real final hidden — replicate,
        # then head math once on every stage (identical values)
        x_final = jax.lax.psum(
            jnp.where(s == pp - 1, x_final, 0.0), "pp")
        xf = rms_norm(x_final.astype(jnp.bfloat16), params.out_norm,
                      llm.norm_eps).astype(jnp.bfloat16)
        if logits_mode == "none":
            logits = jnp.zeros((S, 0), jnp.float32)
        elif logits_mode == "last":
            logits = qmatmul(xf[:, -1, :], params.lm_head,
                             backend=backend).astype(jnp.float32)
        else:
            logits = qmatmul(xf.reshape(S * Tq, -1), params.lm_head,
                             backend=backend).reshape(S, Tq, -1
                                                      ).astype(jnp.float32)
        outs = (logits, kv) + ((blk,) if window else ())
        if return_final_hidden:
            outs = outs + (x_final,)
        return outs

    out_specs = (P(), kspecs)
    if window:
        out_specs = out_specs + (pp_window_specs(),)
    if return_final_hidden:
        out_specs = out_specs + (P(),)
    if intra_mask is not None:
        intra_mask = jnp.asarray(intra_mask, bool)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, kspecs, P(), P(), act_spec, emb_spec, emb_spec,
                  win_specs if window else None,
                  None if cache_positions is None else P(),
                  None if intra_mask is None else P()),
        out_specs=out_specs,
        check_vma=False)
    return f(params, kv, tokens, positions, active, embeds, use_embeds,
             inflight, cache_positions, intra_mask)


@functools.partial(jax.jit,
                   static_argnames=("llm", "n_steps", "backend", "mesh"),
                   donate_argnums=(2,))
def pp_decode_scan(params: LlamaParams, tokens: jax.Array, kv: KVCache,
                   llm: LLMConfig, n_steps: int, mesh: Mesh,
                   backend: str = "auto") -> tuple[jax.Array, KVCache]:
    """Greedy multi-step decode through the pipeline."""

    def body(carry, _):
        tok, kv = carry
        pos = kv.pos.astype(jnp.int32)
        logits, kv = pp_forward(params, llm, kv, tok[:, None], pos[:, None],
                                mesh=mesh, backend=backend,
                                logits_mode="last")
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, kv), nxt

    (_, kv), toks = jax.lax.scan(body, (tokens, kv), None, length=n_steps)
    return toks.T, kv


def pp_prefill_microbatched(params: LlamaParams, llm: LLMConfig,
                            kv: KVCache, tokens: jax.Array,
                            positions: jax.Array, *, mesh: Mesh,
                            n_micro: int, backend: str = "auto"):
    """Throughput prefill: the SLOT axis splits into n_micro microbatch
    groups that flow through the pipe GPipe-style — phase t has stage s
    working on microbatch t - s, so all stages overlap after the fill
    latency (bubble fraction (pp-1)/(n_micro+pp-1) of stage-steps).

    tokens/positions: [S, C]; S must divide by n_micro. Returns the
    updated kv (prefill discards logits)."""
    pp = mesh.shape["pp"]
    S, C = tokens.shape
    if S % n_micro:
        raise ValueError(f"{S} slots not divisible by n_micro={n_micro}")
    mb = S // n_micro
    pspecs = pp_param_specs(params)
    kspecs = pp_kv_specs(kv)

    def body(params, kv, tokens, positions):
        params = _localize_params(params)
        s = jax.lax.axis_index("pp")
        # microbatch m's embedding, staged for ingestion at phase m
        x_all = params.embed.lookup(tokens).astype(jnp.bfloat16)
        x_mb = x_all.reshape(n_micro, mb, C, -1)
        tok_mb = tokens.reshape(n_micro, mb, C)
        pos_mb = positions.reshape(n_micro, mb, C)

        def phase(carry, t):
            x_res, kv = carry
            m = t - s  # microbatch index resident on this stage
            valid = (m >= 0) & (m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            # stage 0 ingests microbatch t fresh from the embedding
            x_in = jnp.where(s == 0, x_mb[jnp.clip(t, 0, n_micro - 1)],
                             x_res)
            toks_t = tok_mb[m_c]
            pos_t = jnp.where(valid, pos_mb[m_c],
                              -jnp.ones_like(pos_mb[m_c]))
            # map the microbatch's rows onto their true slots: run on
            # the FULL slot batch with only the resident rows active
            full_tok = jnp.zeros((S, C), jnp.int32)
            full_pos = -jnp.ones((S, C), jnp.int32)
            full_x = jnp.zeros((S, C, x_in.shape[-1]), x_in.dtype)
            row0 = m_c * mb
            full_tok = jax.lax.dynamic_update_slice(full_tok, toks_t,
                                                    (row0, 0))
            full_pos = jax.lax.dynamic_update_slice(full_pos, pos_t,
                                                    (row0, 0))
            full_x = jax.lax.dynamic_update_slice(full_x, x_in,
                                                  (row0, 0, 0))
            act = jnp.zeros(S, bool)
            act = jax.lax.dynamic_update_slice(
                act, jnp.full((mb,), True) & valid, (row0,))
            _, kv, x_out = forward(
                params, llm, kv, full_tok, full_pos, active=act,
                embeds=full_x, backend=backend, logits_mode="none",
                return_final_hidden=True)
            x_keep = jax.lax.dynamic_slice(x_out, (row0, 0, 0),
                                           (mb, C, x_out.shape[-1]))
            x_next = jax.lax.ppermute(
                x_keep, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return (x_next, kv), None

        x0 = jnp.zeros((mb, C, x_mb.shape[-1]), jnp.bfloat16)
        (_, kv), _ = jax.lax.scan(phase, (x0, kv),
                                  jnp.arange(n_micro + pp - 1))
        return kv

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, kspecs, P(), P()),
        out_specs=kspecs,
        check_vma=False)
    return f(params, kv, tokens, positions)
