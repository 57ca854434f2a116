"""Llama-family transformer as a pure jitted function (covers llama,
qwen2 = llama + QKV bias, and distilled variants — reference
src/model/llama/llama_model.cpp:52-118 and qwen2_model.cpp:75 share the
same skeleton; here it is one function with an optional-bias pytree).

Layers are stacked on a leading axis and iterated with lax.scan so the
compiled program size is O(1) in depth (the reference rebuilds and
interprets a node graph per step; here tracing + XLA replace its
Graph/Executor pair entirely)."""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LLMConfig, ModelConfig
from ..core.quant import QK
from ..kv.cache import KVCache
from ..kv.paged import PagedKVCache
from ..ops.attention import (
    build_visibility,
    gqa_attention,
    gqa_attention_quant,
    gqa_attention_quant_deferred,
)
from ..ops.elementwise import apply_rope, rms_norm, rope_cos_sin, silu_hadamard
from ..ops.fused import fused_linear
from ..ops.qmatmul import QLinear, qmatmul

import os as _os

# default for forward(kv_update=None): "auto" routes by shape —
# measured on-TPU (8B Q4_K, marginal method, fresh processes x2):
# deferred wins decode (70.9 vs 68.5 tok/s; no per-layer cache-slab
# copies inside the layer scan), inline wins prefill (6.3k vs 5.7k
# tok/s; the post-scan batched scatter re-reads the big new-KV block)
_KV_UPDATE_DEFAULT = _os.environ.get("POWERSERVE_KV_UPDATE", "auto")

# MoE FFN dispatch: "grouped" sorts tokens by routed expert and runs one
# grouped qmatmul per projection (E/k fewer FLOPs, exact — ops/moe.py);
# "dense" runs every expert on every token (weights zeroed); "auto"
# groups when the token batch is large enough that FLOPs dominate the
# per-expert slab reads the padding tiles add.
_MOE_DISPATCH = _os.environ.get("POWERSERVE_MOE_DISPATCH", "auto")
_MOE_BLOCK_M = int(_os.environ.get("POWERSERVE_MOE_BLOCK_M", "128"))
_MOE_GROUP_MIN = int(_os.environ.get("POWERSERVE_MOE_GROUP_MIN", "64"))


def _moe_grouped_decode_wins(a: int, n_local: int, bm: int = 16) -> bool:
    """Decode-batch MoE routing choice by HBM slab reads: grouped
    dispatch reads at most ceil(a/bm) + min(a, n_local) expert slabs
    (ops/moe.py capacity bound at M tile bm), dense-all-experts reads
    n_local. Engage grouped when it strictly reads fewer."""
    return (a + bm - 1) // bm + min(a, n_local) < n_local

# Fused decode-chain kernels (ops/fused.py) in layer_body: "all" fuses
# every decode-sized layer, "head" only the lm_head/out_norm (+argmax),
# "off" nothing. MEASURED (8B Q4_K bench.py A/B): "all" = 85.5 vs 89.6
# tok/s — on the 32-layer main path the bsum kernel's dequant
# efficiency beats the launch savings, so the default keeps main
# layers unfused; 1-2 layer DRAFT forwards (chain/eagle) are launch-
# latency-bound and request fusion explicitly via forward(fuse_layers=
# True).
_FUSED_DECODE = _os.environ.get("POWERSERVE_FUSED_DECODE", "head")

# Layer-scan chunking: split the length-L layer scan into an outer scan
# of L/C inner scans of C layers (exact — pure reassociation of the
# same iteration order). Probed for the L=32 decode cliff (see below) —
# did NOT help (14.04 vs 13.68 ms), kept as a measurement knob only.
_LAYER_SCAN_CHUNK = int(_os.environ.get("POWERSERVE_LAYER_SCAN_CHUNK",
                                        "0"))

# How the layer scan reads the (loop-invariant, deferred-mode) KV
# cache: "xs" — cache rides as lax.scan xs, sliced by the scan
# machinery; "closure" — cache is captured and jnp.take-sliced inside
# the body. THE L=32 DECODE CLIFF (.bench_lcurve.py, 8B dims):
# step time is linear at 324 us/layer through L=31 (T=1024) but jumps
# +2.1-2.9 ms at L=32 — at BOTH ffn=14336 and ffn=8192 (weight bytes
# ruled out), with inline AND deferred kv_update (commit ruled out),
# unchanged by nested-scan chunking (trip count ruled out), and GONE at
# T=512 — i.e. it triggers on the CACHE buffer size as scan xs
# (k and v each hit exactly 2^25 bytes at [32,1,8,1024,128] int8).
_SCAN_CACHE = _os.environ.get("POWERSERVE_SCAN_CACHE", "xs")


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scales", "bias"],
    meta_fields=[],
)
@dataclass
class QEmbedding:
    """Quantized embedding table: rows gathered then dequantized
    (reference get_embedding with inline Q4/Q8 row dequant,
    ggml_wrapper.cpp:181-211)."""

    q: jax.Array  # int8 [V, D]
    scales: jax.Array  # f32 [V, D // 32]
    bias: jax.Array | None  # f32 [V, D // 32] (Q4_K) or None

    def lookup(self, tokens: jax.Array) -> jax.Array:
        rows = self.q[tokens].astype(jnp.float32)
        sc = jnp.repeat(self.scales[tokens], QK, axis=-1)
        x = rows * sc
        if self.bias is not None:
            x = x - jnp.repeat(self.bias[tokens], QK, axis=-1)
        return x


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["attn_norm", "ffn_norm", "wq", "wk", "wv", "wo",
                 "bq", "bk", "bv", "w_gate", "w_up", "w_down",
                 "wqkv", "bqkv", "wgu", "q_norm", "k_norm",
                 "router", "w_gate_exps", "w_up_exps", "w_down_exps"],
    meta_fields=[],
)
@dataclass
class LayerWeights:
    attn_norm: jax.Array  # [dim] f32
    ffn_norm: jax.Array
    wq: QLinear | None
    wk: QLinear | None
    wv: QLinear | None
    wo: QLinear
    bq: jax.Array | None  # [n_heads * head_dim] (qwen2_weight.hpp:12-24)
    bk: jax.Array | None
    bv: jax.Array | None
    w_gate: QLinear | None
    w_up: QLinear | None
    w_down: QLinear | None
    # fused projections (fewer, larger kernel launches — decode is
    # launch-overhead sensitive); when set, the unfused fields are None
    wqkv: QLinear | None = None
    bqkv: jax.Array | None = None  # concat [H*D + 2*Hkv*D]
    wgu: QLinear | None = None  # gate|up concat [dim, 2*ffn]
    # QK-norm (qwen3): per-head RMS norm weights [head_dim] applied to
    # q / k after the head reshape, before RoPE
    q_norm: jax.Array | None = None
    k_norm: jax.Array | None = None
    # mixture-of-experts FFN (mixtral / qwen3moe): router [dim, E] f32
    # + expert projections stacked on a leading E axis (per layer);
    # when set, w_gate/w_up/w_down are None
    router: jax.Array | None = None
    w_gate_exps: QLinear | None = None  # q [E(, L merged), K.., ffn]
    w_up_exps: QLinear | None = None
    w_down_exps: QLinear | None = None


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed", "layers", "out_norm", "lm_head", "lm_head_lr"],
    meta_fields=[],
)
@dataclass
class LlamaParams:
    embed: QEmbedding
    layers: LayerWeights  # leaves stacked on leading L axis
    out_norm: jax.Array  # [dim]
    lm_head: QLinear  # [dim, vocab]
    # optional FACTORED draft head (speculative/draft_head.py): logits
    # = (xh @ U) @ V with U [dim, r], V [r, vocab] re-quantized — ~7x
    # fewer HBM bytes than the full lm_head at r=512. DRAFT models
    # only: the emitted stream stays lossless (rejection sampling uses
    # whatever distribution the draft actually sampled from; the
    # target verify keeps the exact lm_head) — the tradeoff is
    # acceptance rate, not correctness. None everywhere else.
    lm_head_lr: tuple | None = None


def forward(params: LlamaParams, cfg: LLMConfig, kv: KVCache,
            tokens: jax.Array, positions: jax.Array, *,
            active: jax.Array | None = None,
            intra_mask: jax.Array | None = None,
            visible: jax.Array | None = None,
            cache_positions: jax.Array | None = None,
            vis_override: jax.Array | None = None,
            backend: str = "auto",
            logits_mode: str = "last",
            embeds: jax.Array | None = None,
            return_hidden: bool = False,
            return_final_hidden: bool = False,
            tp_axis: str | None = None,
            sp_axis: str | None = None,
            ep_axis: str | None = None,
            kv_update: str | None = None,
            inflight: tuple | None = None,
            fuse_layers: bool | None = None):
    """One forward pass over a batch of slots.

    tokens/positions: [S, Tq] int32 (positions drive RoPE). active: [S]
    bool — rows that run.
    intra_mask: [Tq, Tq] bool or None (causal) — tree verification mask.
    visible: [S, Tq] bool or None — False keeps a written token masked
             after advance (draft-tree siblings).
    cache_positions: [S, Tq] or None — where K/V rows are written when
             it differs from the sequence position (token-tree drafting:
             rope position = depth, cache slot = tree index; reference
             keeps the same {position, cache_index} split per node).
    vis_override: [S, Tq, T] bool or None — full per-query cache
             visibility (tree drafting: each frontier node sees only its
             ancestor path, reference switch_parent mask semantics).
    logits_mode: "last" -> [S, vocab] for the final position;
                 "all" -> [S, Tq, vocab] (perplexity / verification);
                 "none" -> zeros [S, 0] (prefill chunks before the last).
    return_hidden: also return per-layer hidden states [L, S, Tq, dim]
                 (numerics debugging — the reference's
                 POWERSERVE_DUMP_TENSORS role, executor.cpp:52-75).
    return_final_hidden: also return the last layer's PRE-norm hidden
                 state [S, Tq, dim] — the "feature" an EAGLE-style
                 draft head autoregresses over (speculative/eagle.py).
    kv_update: "inline" — each layer scatters its new K/V into the
                 cache before attention (required for vis_override
                 paths); "deferred" — the layer scan collects the new
                 quantized K/V as small scan outputs, attention treats
                 them as an in-flight block past the cache, and ONE
                 batched scatter after the scan commits all layers
                 (avoids per-layer slab copies XLA materializes for
                 scatters on loop-sliced cache slabs); "auto" — deferred
                 at decode-sized Tq (<= 16), inline otherwise (the
                 measured winner per shape). None -> the
                 POWERSERVE_KV_UPDATE env default ("auto"). Falls back
                 to inline for vis_override / float-cache / unrolled
                 layers. "window" — like deferred, but the new K/V are
                 NOT committed at all: they return to the caller as a
                 4th output (k, v, ks, vs stacked [L, S, Hkv, Tq, ..]),
                 and `inflight` carries the caller's window of
                 previous uncommitted steps. This keeps the big cache
                 buffers LOOP-INVARIANT inside a multi-step decode scan:
                 committing into a >= 2^25-byte carried cache buffer
                 inside lax.scan costs +2-3 ms/step on v5e (the
                 measured L=32 cliff, .bench_lcurve/.bench_scanparts —
                 XLA loses in-place aliasing); the window costs ~0.
    inflight: (wk [L,S,Hkv,W,D] int8, wv, wks [L,S,Hkv,W] f32, wvs,
                 filled int32 scalar) — quantized K/V of the caller's
                 previous W uncommitted decode steps, of which `filled`
                 are real. Attention sees them as an extra visibility-
                 masked block between the committed cache and this
                 step's tokens. Requires kv_update="window".
    tp_axis: when called inside a shard_map over a mesh axis of that
                 name (parallel/tp.py), params hold LOCAL tensor-
                 parallel shards and cfg holds LOCAL head counts; the
                 megatron-style collectives are inserted here: psum
                 after the row-parallel wo / w_down projections, a
                 masked-gather + psum for a vocab-sharded embedding,
                 and an all-gather for a vocab-sharded lm_head.
    Returns (logits f32, updated KVCache) or (logits, kv, hidden).
    """
    S, Tq = tokens.shape
    llm = cfg
    H, Hkv, D = llm.n_heads, llm.n_kv_heads, llm.head_size
    if cache_positions is None:
        cache_positions = positions
    if sp_axis is not None:
        # sequence parallel (inside a shard_map): this shard owns cache
        # rows [t0, t0 + T_local); remap write positions to local
        # coordinates, redirecting other shards' tokens to -1 (their
        # scatters drop; each global position lands on exactly one
        # shard). RoPE keeps the GLOBAL positions.
        assert kv.quantized, "sequence parallel requires the int8 KV cache"
        t_local = kv.max_seq
        t0 = jax.lax.axis_index(sp_axis) * t_local
        cache_positions = jnp.where(
            (cache_positions >= t0) & (cache_positions < t0 + t_local),
            cache_positions - t0, -1)

    # embeds: precomputed input embeddings (VLM paths inject projected
    # image features at image-token positions; reference qnn_forward_vl)
    if embeds is not None:
        x = embeds.astype(jnp.bfloat16)
    elif tp_axis is not None and params.embed.q.shape[0] < llm.vocab_size:
        # vocab-sharded embedding: gather the locally-owned rows, zero
        # the rest, psum across the tp axis (exactly one shard owns
        # each token id)
        v_local = params.embed.q.shape[0]
        off = jax.lax.axis_index(tp_axis) * v_local
        local = tokens - off
        ok = (local >= 0) & (local < v_local)
        xg = params.embed.lookup(jnp.where(ok, local, 0))
        xg = jnp.where(ok[..., None], xg, 0.0)
        x = jax.lax.psum(xg, tp_axis).astype(jnp.bfloat16)
    else:
        x = params.embed.lookup(tokens).astype(jnp.bfloat16)  # [S, Tq, dim]
    cos, sin = rope_cos_sin(positions, llm.rope, D)  # [S, Tq, D/2]
    if vis_override is not None:
        vis = vis_override
    else:
        vis = build_visibility(kv.mask, cache_positions, intra_mask)
    scale = 1.0 / float(np.sqrt(D))
    rope_type = llm.rope.rope_type

    quantized = kv.quantized
    # MoE: expert QLinear leaves are [E, ...] per layer (unrolled) or
    # [L, E, ...] stacked. For the stacked scan, flatten a
    # (layer, expert) VIEW (free contiguous reshape) so the kernel's
    # scalar-prefetch index layer * moe_e_local + e picks a slab; the
    # stored [L, E, ...] order stays shardable over an "ep" axis (under
    # an ep shard_map these leaves are the LOCAL expert slice).
    import dataclasses as _dcm

    _tuple_mode = isinstance(params.layers, (tuple, list))
    _lw0 = params.layers[0] if _tuple_mode else params.layers
    if _lw0.w_gate_exps is not None:
        if _tuple_mode:
            moe_e_local = _lw0.w_gate_exps.q.shape[0]
        else:
            moe_e_local = _lw0.w_gate_exps.q.shape[1]

            def _flat(lin):
                return _dcm.replace(
                    lin,
                    q=lin.q.reshape((-1,) + lin.q.shape[2:]),
                    scales=lin.scales.reshape(
                        (-1,) + lin.scales.shape[2:]),
                    bias=None if lin.bias is None
                    else lin.bias.reshape((-1,) + lin.bias.shape[2:]))

            params = _dcm.replace(params, layers=_dcm.replace(
                params.layers,
                w_gate_exps=_flat(params.layers.w_gate_exps),
                w_up_exps=_flat(params.layers.w_up_exps),
                w_down_exps=_flat(params.layers.w_down_exps)))
    else:
        moe_e_local = 0
    paged = isinstance(kv, PagedKVCache)
    if paged:
        assert sp_axis is None, "paged KV + sequence parallel unsupported"
        # logical -> pool coordinates, shared by every layer's scatter
        pg_idx, pg_off = kv.locate(cache_positions)
    if kv_update is None:
        kv_update = _KV_UPDATE_DEFAULT
    if kv_update == "auto":  # decode-sized queries defer, prefill inlines
        kv_update = "deferred" if Tq <= 16 else "inline"
    window = kv_update == "window"
    if window:
        # intra_mask IS allowed (tree verifies pass the ancestor mask;
        # the deferred in-flight visibility below composes it) —
        # vis_override is not (window lanes replace its role). sp_axis
        # IS allowed: the deferred attention routes to the sp-merge
        # variant with window lanes gated onto shard 0.
        assert (inflight is not None and vis_override is None
                and quantized
                and not return_hidden
                and not isinstance(params.layers, (tuple, list))), \
            "kv_update='window' needs inflight + plain-decode " \
            "quantized stacked-scan config"
    deferred = ((kv_update == "deferred" or window)
                and vis_override is None
                and quantized and (sp_axis is None or window)
                and not isinstance(params.layers, (tuple, list)))
    if deferred:
        # in-flight visibility: intra mask with padded/OOB lanes' columns
        # masked off (inline gets this for free — their scatters drop)
        if intra_mask is None:
            qi = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tq), 0)
            ji = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tq), 1)
            intra_vis_new = ji <= qi
        else:
            intra_vis_new = intra_mask
        valid_new = (cache_positions >= 0) & (cache_positions < kv.max_seq)
        intra_vis_new = intra_vis_new[None, :, :] & valid_new[:, None, :]

    if window:
        w_k, w_v, w_ks, w_vs, w_filled = inflight
        W_win = w_k.shape[3]
        # w_filled: scalar int -> first `filled` lanes visible (decode
        # loop); bool [S, W] -> per-slot lane validity (spec scans,
        # where rollback invalidates lanes); bool [S, Tq, W] ->
        # PER-QUERY lane visibility (tree DRAFT levels: a query sees
        # prior committed lanes plus only its own ancestors among this
        # step's lanes — the window-mode replacement for vis_override)
        if getattr(w_filled, "ndim", 0) == 3:
            win_vis = w_filled.astype(bool)
        elif getattr(w_filled, "dtype", None) == jnp.bool_ \
                or getattr(w_filled, "ndim", 0) == 2:
            win_vis = jnp.broadcast_to(w_filled[:, None, :].astype(bool),
                                       (S, Tq, W_win))
        else:
            win_vis = jnp.broadcast_to(
                (jnp.arange(W_win) < w_filled)[None, None, :],
                (S, Tq, W_win))
        if sp_axis is not None:
            # window lanes are replicated across sp shards; the sp
            # softmax merge must count each exactly once -> shard 0
            # owns them (the CURRENT step's lanes instead gate
            # per-shard through the local position remap below)
            win_vis = win_vis & (jax.lax.axis_index(sp_axis) == 0)

    def layer_body(x, lw, k_l, v_l, ks_l, vs_l, layer=None, win=None):
        # layer!=None: lw holds stacked [L, ...] weights (scan mode) —
        # small tensors are sliced here, QLinears are indexed inside the
        # kernel via scalar prefetch (no HBM slice copies)
        def sl(t):
            if t is None or layer is None:
                return t
            return jnp.take(t, layer, axis=0)

        def lin(h, w, b):
            y = qmatmul(h, w, backend=backend, layer=layer)
            return y if b is None else y + sl(b)

        # fused decode chain (ops/fused.py): norm/silu/residual glue
        # moves INTO the Pallas matmul kernels, cutting the per-layer
        # serial launch chain (the decode fixed cost is launch latency,
        # not FLOPs). Decode-sized batches only; prefill keeps the
        # separate MXU-shaped path.
        fuse_layer = (lw.wqkv is not None and lw.wgu is not None
                      and lw.q_norm is None and lw.router is None
                      and S * Tq <= 16
                      and (fuse_layers if fuse_layers is not None
                           else _FUSED_DECODE == "all"))
        xf_rows = x.reshape(S * Tq, -1)
        if fuse_layer:
            qkv = fused_linear(lw.wqkv, norm=(xf_rows, lw.attn_norm),
                               bias=lw.bqkv, eps=llm.norm_eps,
                               layer=layer, backend=backend)
            q = qkv[:, : H * D].reshape(S, Tq, H, D)
            knew = qkv[:, H * D : (H + Hkv) * D].reshape(S, Tq, Hkv, D)
            vnew = qkv[:, (H + Hkv) * D :].reshape(S, Tq, Hkv, D)
        else:
            h = rms_norm(x, sl(lw.attn_norm),
                         llm.norm_eps).astype(jnp.bfloat16)
            hf = h.reshape(S * Tq, -1)
            if lw.wqkv is not None:
                qkv = lin(hf, lw.wqkv, lw.bqkv)
                q = qkv[:, : H * D].reshape(S, Tq, H, D)
                knew = qkv[:, H * D : (H + Hkv) * D].reshape(S, Tq, Hkv, D)
                vnew = qkv[:, (H + Hkv) * D :].reshape(S, Tq, Hkv, D)
            else:
                q = lin(hf, lw.wq, lw.bq).reshape(S, Tq, H, D)
                knew = lin(hf, lw.wk, lw.bk).reshape(S, Tq, Hkv, D)
                vnew = lin(hf, lw.wv, lw.bv).reshape(S, Tq, Hkv, D)
            if lw.q_norm is not None:
                # qwen3 QK-norm: per-head RMS over head_dim, before RoPE
                q = rms_norm(q, sl(lw.q_norm), llm.norm_eps)
                knew = rms_norm(knew, sl(lw.k_norm), llm.norm_eps)
        q = apply_rope(q, cos, sin, rope_type)
        knew = apply_rope(knew, cos, sin, rope_type)

        # scatter new K/V into this layer's cache slabs ([H, T, D] per
        # slot, seq on axis -2); out-of-range positions redirect past
        # the end and are dropped (jit-safe)
        safe_pos = jnp.where(
            (cache_positions >= 0) & (cache_positions < kv.max_seq),
            cache_positions, kv.max_seq)

        def scat(cache_s, new_s, pos_s):
            # cache_s [H, T, ...]; new_s [H, Tq, ...]
            return cache_s.at[:, pos_s].set(new_s.astype(cache_s.dtype),
                                            mode="drop")

        if paged and deferred:
            # deferred paged decode: NO per-layer pool scatter (slab
            # updates inside the scan force XLA to copy the loop-sliced
            # pool slab every layer — the measured +33-44% S=8 paged
            # overhead, CLAUDE.md r2s4 A/B). The committed pages stream
            # through the paged flash kernel in STATE mode; this step's
            # K/V ride as a second softmax partition merged in XLA, and
            # one post-scan scatter commits all layers.
            kq, ks = KVCache.quantize_kv(knew)
            vq, vsc = KVCache.quantize_kv(vnew)
            kqh = kq.transpose(0, 2, 1, 3)  # [S, Hkv, Tq, D]
            vqh = vq.transpose(0, 2, 1, 3)
            ksh = ks.transpose(0, 2, 1)  # [S, Hkv, Tq]
            vsh = vsc.transpose(0, 2, 1)
            if win is not None:
                # window mode over the pool: the caller's uncommitted
                # window lanes widen the in-flight partition exactly
                # like the dense window path below — the state-mode
                # flash kernel only sees committed pages either way
                wk_l, wv_l, wks_l, wvs_l = win
                kqh_w = jnp.concatenate([wk_l, kqh], axis=2)
                vqh_w = jnp.concatenate([wv_l, vqh], axis=2)
                ksh_w = jnp.concatenate([wks_l, ksh], axis=2)
                vsh_w = jnp.concatenate([wvs_l, vsh], axis=2)
                intra_w = jnp.concatenate([win_vis, intra_vis_new],
                                          axis=-1)
            else:
                kqh_w, vqh_w, ksh_w, vsh_w = kqh, vqh, ksh, vsh
                intra_w = intra_vis_new
            route_flash = backend in ("auto", "pallas",
                                      "pallas_interpret")
            if route_flash and (backend == "pallas_interpret"
                                or jax.default_backend() == "tpu"):
                from ..ops.flash_decode import flash_decode_paged_deferred

                vis_c = jnp.broadcast_to(kv.mask[:, None, :],
                                         (S, Tq, kv.mask.shape[1]))
                attn = flash_decode_paged_deferred(
                    q, k_l, ks_l, v_l, vs_l, kv.page_table, vis_c,
                    kqh_w, ksh_w, vqh_w, vsh_w, intra_w, scale,
                    kv.page_size,
                    interpret=backend == "pallas_interpret")
            else:
                attn = gqa_attention_quant_deferred(
                    q, kv.gather_slab(k_l), kv.gather_slab(ks_l),
                    kv.gather_slab(v_l), kv.gather_slab(vs_l), kv.mask,
                    kqh_w, ksh_w, vqh_w, vsh_w, intra_w, scale)
            k_l, v_l, ks_l, vs_l = kqh, vqh, ksh, vsh
        elif paged:
            # paged pool: scatter through the page table, then gather a
            # dense per-slot view for attention (one whole-page gather
            # per layer; the Pallas paged-decode path can scalar-
            # prefetch the table instead once measured)
            kq, ks = KVCache.quantize_kv(knew)  # [S, Tq, Hkv, D/..]
            vq, vsc = KVCache.quantize_kv(vnew)
            k_l = PagedKVCache.scatter_slab(k_l, kq, pg_idx, pg_off)
            v_l = PagedKVCache.scatter_slab(v_l, vq, pg_idx, pg_off)
            ks_l = PagedKVCache.scatter_slab(ks_l, ks, pg_idx, pg_off)
            vs_l = PagedKVCache.scatter_slab(vs_l, vsc, pg_idx, pg_off)
            # decode always takes the paged-flash kernel: the XLA
            # alternative materializes the gathered view per layer —
            # measured 100-130 ms/step vs ~dense-parity for the kernel
            # (.bench_paged.py; the old T>=2048 gate was inherited from
            # the DENSE flash-vs-XLA crossover, irrelevant here)
            route_flash = (Tq == 1
                           and backend in ("auto", "pallas",
                                           "pallas_interpret"))
            if route_flash and (backend == "pallas_interpret"
                                or jax.default_backend() == "tpu"):
                # decode: stream pages via scalar-prefetched page table
                # instead of materializing the gathered view per layer
                from ..ops.flash_decode import flash_decode_paged

                attn = flash_decode_paged(
                    q, k_l, ks_l, v_l, vs_l, kv.page_table, vis, scale,
                    kv.page_size,
                    interpret=backend == "pallas_interpret")
            else:
                contiguous = (intra_mask is None and vis_override is None
                              and Tq > 1)
                attn = gqa_attention_quant(
                    q, kv.gather_slab(k_l), kv.gather_slab(ks_l),
                    kv.gather_slab(v_l), kv.gather_slab(vs_l), vis, scale,
                    backend=backend,
                    prefill_start=(cache_positions[:, 0] if contiguous
                                   else None),
                    cache_mask=kv.mask if contiguous else None)
        elif deferred:
            # no scatter here: attention treats this layer's quantized
            # new K/V as an in-flight block; the post-scan batch write
            # commits every layer at once
            kq, ks = KVCache.quantize_kv(knew)
            vq, vsc = KVCache.quantize_kv(vnew)
            kqh = kq.transpose(0, 2, 1, 3)  # [S, Hkv, Tq, D]
            vqh = vq.transpose(0, 2, 1, 3)
            ksh = ks.transpose(0, 2, 1)  # [S, Hkv, Tq]
            vsh = vsc.transpose(0, 2, 1)
            if win is not None:
                # window mode: the caller's previous uncommitted steps
                # prepend this step's block (one wider in-flight
                # partition; unfilled lanes masked off by win_vis)
                wk_l, wv_l, wks_l, wvs_l = win
                infl = (jnp.concatenate([wk_l, kqh], axis=2),
                        jnp.concatenate([wks_l, ksh], axis=2),
                        jnp.concatenate([wv_l, vqh], axis=2),
                        jnp.concatenate([wvs_l, vsh], axis=2),
                        jnp.concatenate([win_vis, intra_vis_new],
                                        axis=-1))
                if sp_axis is not None:
                    from ..ops.attention import (
                        gqa_attention_quant_sp_deferred,
                    )

                    attn = gqa_attention_quant_sp_deferred(
                        q, k_l, ks_l, v_l, vs_l, kv.mask,
                        infl[0], infl[1], infl[2], infl[3], infl[4],
                        scale, sp_axis)
                else:
                    attn = gqa_attention_quant_deferred(
                        q, k_l, ks_l, v_l, vs_l, kv.mask,
                        infl[0], infl[1], infl[2], infl[3], infl[4],
                        scale)
            else:
                attn = gqa_attention_quant_deferred(
                    q, k_l, ks_l, v_l, vs_l, kv.mask, kqh, ksh, vqh, vsh,
                    intra_vis_new, scale)
            k_l, v_l, ks_l, vs_l = kqh, vqh, ksh, vsh
        elif quantized:
            kq, ks = KVCache.quantize_kv(knew)
            vq, vsc = KVCache.quantize_kv(vnew)
            k_l = jax.vmap(scat)(k_l, kq.transpose(0, 2, 1, 3), safe_pos)
            v_l = jax.vmap(scat)(v_l, vq.transpose(0, 2, 1, 3), safe_pos)
            ks_l = jax.vmap(scat)(ks_l, ks.transpose(0, 2, 1), safe_pos)
            vs_l = jax.vmap(scat)(vs_l, vsc.transpose(0, 2, 1), safe_pos)
            # attention reads int8 KV directly; per-token scales fold
            # into the score/prob tensors (no dequantized cache copies).
            # standard-prefill contiguity facts let the flash-prefill
            # kernel (env-gated) compute visibility in-kernel
            if sp_axis is not None:
                # sequence parallel: local partial softmax + tiny
                # cross-shard merge collectives
                from ..ops.attention import gqa_attention_quant_sp

                attn = gqa_attention_quant_sp(q, k_l, ks_l, v_l, vs_l,
                                              vis, scale, sp_axis)
            else:
                contiguous = (intra_mask is None and vis_override is None
                              and Tq > 1)
                attn = gqa_attention_quant(
                    q, k_l, ks_l, v_l, vs_l, vis, scale, backend=backend,
                    prefill_start=(cache_positions[:, 0] if contiguous
                                   else None),
                    cache_mask=kv.mask if contiguous else None)
        else:
            k_l = jax.vmap(scat)(k_l, knew.transpose(0, 2, 1, 3), safe_pos)
            v_l = jax.vmap(scat)(v_l, vnew.transpose(0, 2, 1, 3), safe_pos)
            attn = gqa_attention(q, k_l, v_l, vis, scale)  # [S, Tq, H*D]
        if fuse_layer:
            attn_out = fused_linear(lw.wo, x=attn.reshape(S * Tq, -1),
                                    layer=layer, backend=backend)
            if tp_axis is not None:  # row-parallel wo: psum partials
                attn_out = jax.lax.psum(attn_out, tp_axis)
            gu = fused_linear(lw.wgu, norm=(xf_rows, attn_out,
                                            lw.ffn_norm),
                              eps=llm.norm_eps, layer=layer,
                              backend=backend)
            if tp_axis is None:
                xn = fused_linear(lw.w_down, glu=gu,
                                  resids=(xf_rows, attn_out),
                                  layer=layer, backend=backend)
            else:
                # row-parallel down proj: the psum must see the bare
                # partial sums, so the residual adds stay outside
                down = jax.lax.psum(
                    fused_linear(lw.w_down, glu=gu, layer=layer,
                                 backend=backend), tp_axis)
                xn = (xf_rows.astype(jnp.float32) + attn_out) + down
            x = xn.reshape(S, Tq, -1).astype(x.dtype)
            return x, (k_l, v_l, ks_l, vs_l)
        attn_out = lin(attn.reshape(S * Tq, -1).astype(jnp.bfloat16),
                       lw.wo, None)
        if tp_axis is not None:  # row-parallel wo: partial sums over K
            attn_out = jax.lax.psum(attn_out, tp_axis)
        x = x + attn_out.reshape(S, Tq, -1).astype(x.dtype)

        h2 = rms_norm(x, sl(lw.ffn_norm), llm.norm_eps).astype(jnp.bfloat16)
        h2f = h2.reshape(S * Tq, -1)
        if lw.router is not None:
            # mixture-of-experts FFN (mixtral / qwen3moe): softmax over
            # all experts, take the top n_experts_used, renormalize
            # (equal to softmax over the selected logits — the HF/
            # llama.cpp norm_topk semantics), then a scan over the
            # LOCAL experts accumulates weighted expert outputs. Every
            # expert runs on every token (weight 0 when unrouted) —
            # correct everywhere and bandwidth-optimal per chip under
            # "ep" sharding; a grouped top-k dispatch kernel is the
            # measured-perf follow-up. ep_axis: experts sharded over
            # that shard_map axis — local ids offset by the shard, the
            # psum sums disjoint expert contributions.
            rl = jnp.einsum("nd,de->ne", h2f.astype(jnp.float32),
                            sl(lw.router).astype(jnp.float32))
            probs = jax.nn.softmax(rl, axis=-1)
            topw, topi = jax.lax.top_k(probs, llm.n_experts_used)
            topw = topw / jnp.maximum(topw.sum(-1, keepdims=True), 1e-9)
            e_off = (0 if ep_axis is None
                     else jax.lax.axis_index(ep_axis) * moe_e_local)
            acc0 = jnp.zeros((h2f.shape[0], x.shape[-1]), jnp.float32)
            if h2f.shape[0] == 1 and ep_axis is None:
                # single-token decode: the routed expert ids are traced
                # scalars, so the kernel's scalar-prefetch index can
                # follow them directly — read ONLY the k selected
                # experts' weights instead of all E (the whole MoE
                # bandwidth advantage at batch 1)
                def sel_step(acc, j):
                    e_g = topi[0, j].astype(jnp.int32)
                    idx = (e_g if layer is None
                           else layer * moe_e_local + e_g)
                    g = qmatmul(h2f, lw.w_gate_exps, backend=backend,
                                layer=idx)
                    u = qmatmul(h2f, lw.w_up_exps, backend=backend,
                                layer=idx)
                    a = silu_hadamard(g, u).astype(jnp.bfloat16)
                    y = qmatmul(a, lw.w_down_exps, backend=backend,
                                layer=idx)
                    return acc + y.astype(jnp.float32) * topw[0, j], None

                down, _ = jax.lax.scan(sel_step, acc0,
                                       jnp.arange(llm.n_experts_used))
            elif _MOE_DISPATCH == "grouped" or (
                    _MOE_DISPATCH == "auto"
                    and (h2f.shape[0] >= _MOE_GROUP_MIN
                         or _moe_grouped_decode_wins(
                             h2f.shape[0] * llm.n_experts_used,
                             moe_e_local))):
                # grouped dispatch: sort assignments by expert, pad each
                # expert's segment to the matmul M tile, compute ONLY
                # routed (token, expert) pairs via per-tile expert
                # prefetch (ops/moe.py + qmatmul_grouped) — exact, E/k
                # fewer FFN FLOPs than dense-all-experts at prefill. At
                # decode-sized batches (S*k assignments << E, e.g.
                # qwen3moe 128 experts at S=8) it engages too: the
                # tightened capacity bound reads at most
                # ceil(a/bm) + a weight slabs vs E for dense.
                from ..ops.moe import combine, group_dispatch
                from ..ops.qmatmul import qmatmul_grouped

                bm_moe = (_MOE_BLOCK_M
                          if h2f.shape[0] >= _MOE_GROUP_MIN else 16)
                tok_p, w_p, tile_e = group_dispatch(
                    topi, topw, moe_e_local, e_off, bm_moe)
                xg = h2f[jnp.maximum(tok_p, 0)]
                tids = (tile_e if layer is None
                        else layer * moe_e_local + tile_e)
                g = qmatmul_grouped(xg, lw.w_gate_exps, tids,
                                    block_m=bm_moe, backend=backend)
                u = qmatmul_grouped(xg, lw.w_up_exps, tids,
                                    block_m=bm_moe, backend=backend)
                a = silu_hadamard(g, u).astype(jnp.bfloat16)
                y = qmatmul_grouped(a, lw.w_down_exps, tids,
                                    block_m=bm_moe, backend=backend)
                down = combine(y, tok_p, w_p, h2f.shape[0])
            else:
                def expert_step(acc, e):
                    idx = e if layer is None else layer * moe_e_local + e
                    g = qmatmul(h2f, lw.w_gate_exps, backend=backend,
                                layer=idx)
                    u = qmatmul(h2f, lw.w_up_exps, backend=backend,
                                layer=idx)
                    a = silu_hadamard(g, u).astype(jnp.bfloat16)
                    y = qmatmul(a, lw.w_down_exps, backend=backend,
                                layer=idx)
                    w_e = jnp.sum(
                        jnp.where(topi == e + e_off, topw, 0.0), axis=-1)
                    return acc + y.astype(jnp.float32) * w_e[:, None], None

                down, _ = jax.lax.scan(expert_step, acc0,
                                       jnp.arange(moe_e_local))
            if ep_axis is not None:
                down = jax.lax.psum(down, ep_axis)
            if tp_axis is not None:  # row-parallel expert down projs
                down = jax.lax.psum(down, tp_axis)
            x = x + down.reshape(S, Tq, -1).astype(x.dtype)
            return x, (k_l, v_l, ks_l, vs_l)
        if lw.wgu is not None:
            gu = lin(h2f, lw.wgu, None)
            F = gu.shape[-1] // 2
            gate, up = gu[:, :F], gu[:, F:]
        else:
            gate = lin(h2f, lw.w_gate, None)
            up = lin(h2f, lw.w_up, None)
        act = silu_hadamard(gate, up).astype(jnp.bfloat16)
        down = lin(act, lw.w_down, None)
        if tp_axis is not None:  # row-parallel down proj
            down = jax.lax.psum(down, tp_axis)
        x = x + down.reshape(S, Tq, -1).astype(x.dtype)
        return x, (k_l, v_l, ks_l, vs_l)

    import dataclasses as _dc

    hidden = []
    if isinstance(params.layers, (tuple, list)):
        # unrolled layer loop: weights are separate arrays, so Pallas
        # kernels read them directly from HBM — lax.scan over stacked
        # weights forces XLA to materialize a per-layer slice copy
        # before each opaque pallas_call (≈3x HBM traffic at decode)
        k_all, v_all = kv.k, kv.v
        ks_all, vs_all = kv.k_scale, kv.v_scale
        for i, lw in enumerate(params.layers):
            x, (k_l, v_l, ks_l, vs_l) = layer_body(
                x, lw, k_all[i], v_all[i], ks_all[i], vs_all[i])
            k_all = k_all.at[i].set(k_l)
            v_all = v_all.at[i].set(v_l)
            if quantized:
                ks_all = ks_all.at[i].set(ks_l)
                vs_all = vs_all.at[i].set(vs_l)
            if return_hidden:
                hidden.append(x)
        kv = _dc.replace(kv, k=k_all, v=v_all, k_scale=ks_all,
                         v_scale=vs_all)
        if return_hidden:
            hidden = jnp.stack(hidden, axis=0)
    else:
        # scan over the layer index; stacked weights stay OUTSIDE the
        # scan as a closure constant, indexed inside the Pallas kernels
        # via scalar prefetch
        stacked = params.layers

        def layer_step(carry, inputs):
            idx, k_l, v_l, ks_l, vs_l = inputs[:5]
            out, cache = layer_body(
                carry, stacked, k_l, v_l, ks_l, vs_l, layer=idx,
                win=inputs[5:] if window else None)
            ys = cache + ((out,) if return_hidden else ())
            return out, ys

        n_layers = kv.k.shape[0]
        if deferred and _SCAN_CACHE == "closure":
            # deferred mode never mutates the cache inside the scan, so
            # it can stay a closure constant with in-body slicing
            # instead of riding as scan xs (L=32 cliff probe)
            def layer_step_cl(carry, idx):
                out, cache = layer_body(
                    carry, stacked,
                    jnp.take(kv.k, idx, axis=0),
                    jnp.take(kv.v, idx, axis=0),
                    jnp.take(kv.k_scale, idx, axis=0),
                    jnp.take(kv.v_scale, idx, axis=0), layer=idx,
                    win=tuple(jnp.take(w, idx, axis=0)
                              for w in (w_k, w_v, w_ks, w_vs))
                    if window else None)
                return out, cache + ((out,) if return_hidden else ())

            x, ys = jax.lax.scan(layer_step_cl, x, jnp.arange(n_layers))
            xs = None
        else:
            xs = (jnp.arange(n_layers), kv.k, kv.v, kv.k_scale,
                  kv.v_scale)
            if window:
                xs = xs + (w_k, w_v, w_ks, w_vs)
        C = _LAYER_SCAN_CHUNK
        if xs is None:
            pass
        elif C > 0 and n_layers > C and n_layers % C == 0:
            # nested scan (see _LAYER_SCAN_CHUNK note): outer L/C x
            # inner C, same iteration order; leading-axis reshapes of
            # the xs/ys are free (contiguous)
            xs = jax.tree_util.tree_map(
                lambda t: t.reshape((n_layers // C, C) + t.shape[1:]), xs)

            def outer_step(carry, inner_xs):
                return jax.lax.scan(layer_step, carry, inner_xs)

            x, ys = jax.lax.scan(outer_step, x, xs)
            ys = jax.tree_util.tree_map(
                lambda t: t.reshape((n_layers,) + t.shape[2:]), ys)
        else:
            x, ys = jax.lax.scan(layer_step, x, xs)
        k_new, v_new, ks_new, vs_new = ys[:4]
        if return_hidden:
            hidden = ys[4]
        if window:
            # no commit at all: the caller owns the window and commits
            # once, OUTSIDE its decode loop (L=32 cliff, see kv_update);
            # for a paged pool the caller's commit scatters lanes
            # through the page table (engine/loops.commit_kv_lanes)
            new_blocks = (k_new, v_new, ks_new, vs_new)
        elif deferred and paged:
            # one batched scatter commits every layer's in-flight K/V
            # into the pool via the page table ([L, S, Hkv, Tq, ...]
            # at (pg_idx, pg_off); page id == n_pages drops)
            def commit_pool(slab, new):
                vals = jnp.swapaxes(new, 2, 3)  # [L, S, Tq, Hkv, ...]
                return jax.vmap(PagedKVCache.scatter_slab,
                                in_axes=(0, 0, None, None))(
                    slab, vals, pg_idx, pg_off)

            kv = _dc.replace(kv,
                             k=commit_pool(kv.k, k_new),
                             v=commit_pool(kv.v, v_new),
                             k_scale=commit_pool(kv.k_scale, ks_new),
                             v_scale=commit_pool(kv.v_scale, vs_new))
        elif deferred:
            # one batched scatter commits every layer's in-flight K/V:
            # stacked new [L, S, Hkv, Tq, ...] into cache [L, S, Hkv, T, ...]
            safe_pos = jnp.where(
                (cache_positions >= 0) & (cache_positions < kv.max_seq),
                cache_positions, kv.max_seq)

            def commit(cache, new, pos_s):
                # per slot: cache [L, Hkv, T, ...], new [L, Hkv, Tq, ...]
                return cache.at[:, :, pos_s].set(new.astype(cache.dtype),
                                                 mode="drop")

            scat_all = jax.vmap(commit, in_axes=(1, 1, 0), out_axes=1)
            kv = _dc.replace(kv,
                             k=scat_all(kv.k, k_new, safe_pos),
                             v=scat_all(kv.v, v_new, safe_pos),
                             k_scale=scat_all(kv.k_scale, ks_new, safe_pos),
                             v_scale=scat_all(kv.v_scale, vs_new, safe_pos))
        else:
            kv = _dc.replace(kv, k=k_new, v=v_new,
                             k_scale=ks_new if quantized else kv.k_scale,
                             v_scale=vs_new if quantized else kv.v_scale)
    kv = kv.advance(
        cache_positions, active=active,
        # window mode: positions advance but stay cache-invisible until
        # the caller's post-loop commit flips them on
        visible=jnp.zeros((S, Tq), bool) if window else visible,
        pos_axis=sp_axis)

    vocab_sharded = (tp_axis is not None
                     and params.lm_head.out_features < llm.vocab_size)
    head_n = (params.lm_head_lr[1].out_features
              if params.lm_head_lr is not None
              else params.lm_head.out_features)
    # greedy "argmax"/"argmax_all" modes only bypass the logits
    # materialization when the head covers exactly the vocab on this
    # shard (otherwise compute logits and argmax outside)
    fuse_am = not vocab_sharded and head_n == llm.vocab_size

    def head_out(h2, argmax=False):
        """[rows, dim] f32/bf16 -> logits f32 (or greedy tokens int32):
        the out_norm prologue + matmul (+ argmax epilogue) run as one
        fused launch (ops/fused.py) at decode rows."""
        if _FUSED_DECODE == "off" and fuse_layers is None:
            xh = rms_norm(h2, params.out_norm,
                          llm.norm_eps).astype(jnp.bfloat16)
            if params.lm_head_lr is not None:
                u, v = params.lm_head_lr
                hr = qmatmul(xh, u, backend=backend).astype(jnp.bfloat16)
                y = qmatmul(hr, v, backend=backend).astype(jnp.float32)
            else:
                y = qmatmul(xh, params.lm_head,
                            backend=backend).astype(jnp.float32)
            if argmax:
                return jnp.argmax(y, axis=-1).astype(jnp.int32)
            return y
        first = dict(norm=(h2, params.out_norm))
        if params.lm_head_lr is not None:
            u, v = params.lm_head_lr
            hr = fused_linear(u, eps=llm.norm_eps, backend=backend,
                              **first)
            return fused_linear(v, x=hr, argmax=argmax, backend=backend)
        return fused_linear(params.lm_head, eps=llm.norm_eps,
                            argmax=argmax, backend=backend, **first)

    if logits_mode == "none":
        logits = jnp.zeros((S, 0), jnp.float32)
    elif logits_mode == "argmax":
        # greedy decode: per-slot best token, [S] int32 — the [S, vocab]
        # logits never leave the head kernel's VMEM when fused
        if fuse_am:
            logits = head_out(x[:, -1, :], argmax=True)
        else:
            lg = head_out(x[:, -1, :])
            if vocab_sharded:
                lg = jax.lax.all_gather(lg, tp_axis, axis=-1, tiled=True)
            logits = jnp.argmax(lg[:, :llm.vocab_size],
                                axis=-1).astype(jnp.int32)
    elif logits_mode == "argmax_all":
        # greedy verify (speculative/chain.py): [S, Tq] int32
        if fuse_am:
            logits = head_out(x.reshape(S * Tq, -1),
                              argmax=True).reshape(S, Tq)
        else:
            lg = head_out(x.reshape(S * Tq, -1)).reshape(S, Tq, -1)
            if vocab_sharded:
                lg = jax.lax.all_gather(lg, tp_axis, axis=-1, tiled=True)
            logits = jnp.argmax(lg[:, :, :llm.vocab_size],
                                axis=-1).astype(jnp.int32)
    elif logits_mode == "last":
        logits = head_out(x[:, -1, :])
        if vocab_sharded:
            logits = jax.lax.all_gather(logits, tp_axis, axis=-1,
                                        tiled=True)
    else:
        logits = head_out(x.reshape(S * Tq, -1)).reshape(S, Tq, -1)
        if vocab_sharded:
            logits = jax.lax.all_gather(logits, tp_axis, axis=-1,
                                        tiled=True)
    if window:
        # with return_final_hidden (EAGLE verify): 4-tuple
        if return_final_hidden:
            return logits, kv, new_blocks, x
        return logits, kv, new_blocks
    if return_hidden:
        return logits, kv, hidden
    if return_final_hidden:
        return logits, kv, x
    return logits, kv
