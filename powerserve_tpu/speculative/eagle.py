"""EAGLE-style draft head: feature-level autoregression.

The reference's speculation cost model is bounded by draft quality per
FLOP; its smallest drafts are full 0.5B models (README.md draft pairs).
EAGLE (Li et al., 2024) replaces the draft model with ONE decoder layer
that autoregresses over the TARGET's last-layer hidden states
("features"): the input at position j is fc([embed(t_j); f_{j-1}]) —
the token at j concatenated with the target feature that produced it —
and the output approximates f_j, decoded through the target's own
lm_head. Draft cost: ~1/L of a target step, far below layer-skip
self-drafting at equal acceptance.

TPU design mirrors speculative/chain.py: the whole
draft->verify->accept->commit cycle runs inside one jitted lax.scan
(one device dispatch per block of speculative steps). The EAGLE cache
is rebuilt from TRUE target features after each verify (one extra
Tq=k+1 head forward, cheap at 1 layer), so drafted-feature noise never
accumulates in the head's KV — the official EAGLE re-prefills its
stable_kv the same way.

No trained EAGLE checkpoints ship with this environment; the head loads
from a converted GGUF (tools/convert_hf.py::convert_eagle) and the
numerics/acceptance machinery is exercised with synthetic weights
(tests/test_eagle.py), including an exact-replica construction that
proves lossless acceptance.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LLMConfig, ModelConfig
from ..kv.cache import KVCache
from ..models.llama import LayerWeights, LlamaParams, QEmbedding, forward
from ..ops.attention import build_visibility, gqa_attention_quant
from ..ops.elementwise import apply_rope, rms_norm, rope_cos_sin, silu_hadamard
from ..ops.fused import fusable, fused_linear
from ..ops.qmatmul import QLinear, qmatmul
from .engine import SpecStats

__all__ = ["EagleParams", "eagle_forward", "eagle_spec_scan",
           "eagle_tree_spec_scan", "EagleChainEngine"]

# (fuse_layers, fuse_head) for the TREE scan's head forwards — read at
# trace time (A/B bisection knob; chains fuse unconditionally, where
# the in-process A/B measured -2.4 ms/step)
_TREE_FUSE = (True, True)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["fc", "fc_bias", "layers", "embed", "lm_head", "out_norm",
                 "lm_head_lr"],
    meta_fields=["input_norm"],
)
@dataclasses.dataclass
class EagleParams:
    """Draft-head weights.

    fc: [2*dim, dim] feature-fusion projection (input order
    [embedding; feature], matching the official EAGLE fc).
    layers: decoder layers (typically one), unrolled tuple.
    embed / lm_head: usually aliases of the target's tables (EAGLE
    shares both; a head GGUF may carry its own).
    out_norm: optional RMS-norm weight applied before lm_head (None =
    head reads the raw feature, EAGLE-1 semantics).
    input_norm: layer 0 applies its attn_norm (EAGLE-1 sets the first
    input_layernorm to identity -> False).
    """

    fc: QLinear
    fc_bias: jax.Array | None
    layers: tuple[LayerWeights, ...]
    embed: QEmbedding
    lm_head: QLinear
    out_norm: jax.Array | None
    input_norm: bool = False
    # optional factored DRAFT head (speculative/draft_head.py): the
    # head's drafting logits via (xh @ U) @ V — ~7x fewer HBM bytes
    # than the shared full lm_head, which .bench_eagle_ablate.py shows
    # is nearly the whole in-scan draft cost. Lossless for the emitted
    # stream (acceptance-rate tradeoff only).
    lm_head_lr: tuple | None = None


def eagle_forward(ep: EagleParams, llm: LLMConfig, kv: KVCache,
                  tokens: jax.Array, features: jax.Array,
                  positions: jax.Array, *,
                  active: jax.Array | None = None,
                  cache_positions: jax.Array | None = None,
                  vis_override: jax.Array | None = None,
                  intra_mask: jax.Array | None = None,
                  backend: str = "auto",
                  logits_mode: str = "last",
                  kv_update: str | None = None,
                  inflight: tuple | None = None,
                  fuse_layers: bool = True,
                  fuse_head: bool = True,
                  tp_axis: str | None = None):
    """One head forward: tokens [S, Tq] with their paired features
    [S, Tq, dim] (feature at position j-1 pairs with the token at j).

    tp_axis: megatron tensor parallelism when called inside a shard_map
    over that mesh axis (parallel/tp.py tp_eagle_spec_scan) — llm must
    carry LOCAL head counts, layer wqkv/wgu are column-parallel
    (pre-permuted by prepare_eagle_for_tp), wo/w_down row-parallel with
    psums, embed/lm_head vocab-sharded (detected from array shapes; fc
    and lm_head_lr replicate). Mirrors models/llama.py forward's
    schedule so the head rides the flagship shard_map serving path.

    llm carries the head's geometry (n_layers == len(ep.layers), head
    counts, rope); kv is the head's own cache. Returns
    (logits, feature_out [S, Tq, dim], kv) — feature_out is the head's
    predicted next feature, fed back in autoregressive drafting.

    kv_update="window" + inflight (wk [L,S,Hkv,W,D] int8, wv, wks, wvs,
    valid [S, W]): the head-cache window mode (models/llama.py forward
    semantics) — cache buffers stay untouched, this forward's new K/V
    comes back as a 4th output (kb, vb, ksb, vsb each [L,S,Hkv,Tq(,D)])
    for the caller's lane push, and attention reads the valid window
    lanes as an extra softmax partition. At serving batch the head
    cache crosses the 2^25-byte carried-scatter cliff exactly like the
    target's (k drafts + one re-prefill scatter per spec step).
    """
    window = kv_update == "window"
    S, Tq = tokens.shape
    H, Hkv, D = llm.n_heads, llm.n_kv_heads, llm.head_size
    if cache_positions is None:
        cache_positions = positions
    if window:
        assert (inflight is not None and vis_override is None
                and kv.quantized), \
            "eagle window mode needs inflight + quantized head cache"

    M = S * Tq
    if tp_axis is not None and ep.embed.q.shape[0] < llm.vocab_size:
        # vocab-sharded table: masked local gather + psum (each shard
        # contributes rows it owns, zeros elsewhere)
        v_local = ep.embed.q.shape[0]
        off = jax.lax.axis_index(tp_axis) * v_local
        local = tokens - off
        ok = (local >= 0) & (local < v_local)
        emb = ep.embed.lookup(jnp.where(ok, local, 0))
        emb = jax.lax.psum(jnp.where(ok[..., None], emb, 0.0), tp_axis)
    else:
        emb = ep.embed.lookup(tokens)
    if fuse_layers:
        # one fused launch: concat prologue + fc matmul + bias epilogue
        # (ops/fused.py; falls back to the identical unfused
        # composition off-TPU / at prefill M)
        x = fused_linear(ep.fc, parts=(emb.reshape(M, -1),
                                       features.reshape(M, -1)),
                         bias=ep.fc_bias, backend=backend)
    else:
        xin = jnp.concatenate([emb.astype(jnp.bfloat16),
                               features.astype(jnp.bfloat16)], axis=-1)
        x = qmatmul(xin.reshape(M, -1), ep.fc, backend=backend)
        if ep.fc_bias is not None:
            x = x + ep.fc_bias
    x = x.reshape(S, Tq, -1).astype(jnp.float32)

    cos, sin = rope_cos_sin(positions, llm.rope, D)
    if vis_override is not None:
        vis = vis_override
    else:
        vis = build_visibility(kv.mask, cache_positions, intra_mask)
    scale = 1.0 / float(np.sqrt(D))
    safe_pos = jnp.where(
        (cache_positions >= 0) & (cache_positions < kv.max_seq),
        cache_positions, kv.max_seq)
    if window:
        from ..ops.attention import gqa_attention_quant_deferred

        w_k, w_v, w_ks, w_vs, w_valid = inflight
        W_win = w_k.shape[3]
        if getattr(w_valid, "ndim", 0) == 3:
            # per-query lane visibility (tree head drafts: a level
            # query sees prior commit lanes + its own ancestors among
            # this step's draft lanes — models/llama.py semantics)
            win_vis = w_valid.astype(bool)
        else:
            win_vis = jnp.broadcast_to(w_valid[:, None, :].astype(bool),
                                       (S, Tq, W_win))
        # in-flight visibility of THIS forward's own lanes: causal
        # within the block (or the caller's intra_mask — tree level
        # drafts pass identity: siblings are mutually invisible), dead
        # (-1 / OOB) lanes' columns off
        if intra_mask is None:
            qi = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tq), 0)
            ji = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tq), 1)
            intra = ji <= qi
        else:
            intra = jnp.asarray(intra_mask, bool)
        valid_new = (cache_positions >= 0) & (cache_positions < kv.max_seq)
        intra_vis_new = intra[None] & valid_new[:, None, :]
        blk_k, blk_v, blk_ks, blk_vs = [], [], [], []

    def scat(cache_s, new_s, pos_s):
        return cache_s.at[:, pos_s].set(new_s.astype(cache_s.dtype),
                                        mode="drop")

    k_all, v_all = kv.k, kv.v
    ks_all, vs_all = kv.k_scale, kv.v_scale
    for i, lw in enumerate(ep.layers):
        xf = x.reshape(M, -1)
        # fused-chain layer (one launch per projection, glue in-kernel)
        # when the projections are pre-fused and there is no QK-norm
        fuse_layer = (fuse_layers
                      and lw.wqkv is not None and lw.wgu is not None
                      and lw.q_norm is None
                      and lw.router is None)

        def lin(v, w, b):
            y = qmatmul(v, w, backend=backend)
            return y if b is None else y + b

        if fuse_layer:
            if i == 0 and not ep.input_norm:
                qkv = fused_linear(lw.wqkv, x=xf, bias=lw.bqkv,
                                   backend=backend)
            else:
                qkv = fused_linear(lw.wqkv, norm=(xf, lw.attn_norm),
                                   bias=lw.bqkv, eps=llm.norm_eps,
                                   backend=backend)
            q = qkv[:, : H * D].reshape(S, Tq, H, D)
            knew = qkv[:, H * D : (H + Hkv) * D].reshape(S, Tq, Hkv, D)
            vnew = qkv[:, (H + Hkv) * D :].reshape(S, Tq, Hkv, D)
        else:
            if i == 0 and not ep.input_norm:
                h = x.astype(jnp.bfloat16)  # EAGLE-1: identity input norm
            else:
                h = rms_norm(x, lw.attn_norm,
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
            if lw.q_norm is not None:  # qwen3-style QK-norm heads
                q = rms_norm(q, lw.q_norm, llm.norm_eps)
                knew = rms_norm(knew, lw.k_norm, llm.norm_eps)
        q = apply_rope(q, cos, sin, llm.rope.rope_type)
        knew = apply_rope(knew, cos, sin, llm.rope.rope_type)

        if window:
            # no cache scatter: this block joins the carried window as
            # a new lane; attention reads cache + valid window lanes +
            # the block itself as one wider in-flight partition
            kq, ks = KVCache.quantize_kv(knew)
            vq, vsc = KVCache.quantize_kv(vnew)
            kqh = kq.transpose(0, 2, 1, 3)  # [S, Hkv, Tq, D]
            vqh = vq.transpose(0, 2, 1, 3)
            ksh = ks.transpose(0, 2, 1)
            vsh = vsc.transpose(0, 2, 1)
            attn = gqa_attention_quant_deferred(
                q, k_all[i], ks_all[i], v_all[i], vs_all[i], kv.mask,
                jnp.concatenate([w_k[i], kqh], axis=2),
                jnp.concatenate([w_ks[i], ksh], axis=2),
                jnp.concatenate([w_v[i], vqh], axis=2),
                jnp.concatenate([w_vs[i], vsh], axis=2),
                jnp.concatenate([win_vis, intra_vis_new], axis=-1),
                scale)
            blk_k.append(kqh)
            blk_v.append(vqh)
            blk_ks.append(ksh)
            blk_vs.append(vsh)
        elif kv.quantized:
            kq, ks = KVCache.quantize_kv(knew)
            vq, vsc = KVCache.quantize_kv(vnew)
            k_l = jax.vmap(scat)(k_all[i], kq.transpose(0, 2, 1, 3), safe_pos)
            v_l = jax.vmap(scat)(v_all[i], vq.transpose(0, 2, 1, 3), safe_pos)
            ks_l = jax.vmap(scat)(ks_all[i], ks.transpose(0, 2, 1), safe_pos)
            vs_l = jax.vmap(scat)(vs_all[i], vsc.transpose(0, 2, 1), safe_pos)
            attn = gqa_attention_quant(q, k_l, ks_l, v_l, vs_l, vis, scale,
                                       backend=backend)
        else:
            from ..ops.attention import gqa_attention

            k_l = jax.vmap(scat)(k_all[i], knew.transpose(0, 2, 1, 3),
                                 safe_pos)
            v_l = jax.vmap(scat)(v_all[i], vnew.transpose(0, 2, 1, 3),
                                 safe_pos)
            ks_l, vs_l = ks_all[i], vs_all[i]
            attn = gqa_attention(q, k_l, v_l, vis, scale)
        if not window:
            k_all = k_all.at[i].set(k_l)
            v_all = v_all.at[i].set(v_l)
            if kv.quantized:
                ks_all = ks_all.at[i].set(ks_l)
                vs_all = vs_all.at[i].set(vs_l)
        if fuse_layer:
            attn_out = fused_linear(lw.wo, x=attn.reshape(M, -1),
                                    backend=backend)
            if tp_axis is not None:  # row-parallel wo: psum partials
                attn_out = jax.lax.psum(attn_out, tp_axis)
            gu = fused_linear(lw.wgu, norm=(xf, attn_out, lw.ffn_norm),
                              eps=llm.norm_eps, backend=backend)
            if tp_axis is None:
                x = fused_linear(lw.w_down, glu=gu, resids=(xf, attn_out),
                                 backend=backend).reshape(S, Tq, -1)
            else:
                # row-parallel down proj: the psum must see the bare
                # partial sums, so the residual adds stay outside
                down = jax.lax.psum(
                    fused_linear(lw.w_down, glu=gu, backend=backend),
                    tp_axis)
                x = ((xf.astype(jnp.float32) + attn_out)
                     + down).reshape(S, Tq, -1)
            continue
        attn_out = lin(attn.reshape(S * Tq, -1).astype(jnp.bfloat16),
                       lw.wo, None)
        if tp_axis is not None:  # row-parallel wo: partial sums over K
            attn_out = jax.lax.psum(attn_out, tp_axis)
        x = x + attn_out.reshape(S, Tq, -1).astype(x.dtype)

        h2 = rms_norm(x, lw.ffn_norm, llm.norm_eps).astype(jnp.bfloat16)
        h2f = h2.reshape(S * Tq, -1)
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

    if window:
        # buffers untouched; positions advance but stay cache-invisible
        # until the caller's post-scan lane commit
        kv = kv.advance(cache_positions, active=active,
                        visible=jnp.zeros((S, Tq), bool))
        new_blocks = (jnp.stack(blk_k), jnp.stack(blk_v),
                      jnp.stack(blk_ks), jnp.stack(blk_vs))
    else:
        kv = dataclasses.replace(kv, k=k_all, v=v_all, k_scale=ks_all,
                                 v_scale=vs_all)
        kv = kv.advance(cache_positions, active=active)

    feature_out = x
    # lm_head_lr (when set) is what head_out actually reads, and it
    # replicates — only the raw lm_head can be vocab-sharded
    vocab_sharded = (tp_axis is not None and ep.lm_head_lr is None
                     and ep.lm_head.out_features < llm.vocab_size)

    def head_out(h2, argmax=False):
        """[rows, dim] f32 -> logits f32 (or greedy tokens int32):
        out_norm prologue + U/V (or lm_head) + optional argmax, fused
        into 1-2 launches (ops/fused.py)."""
        if not fuse_head:
            xh = (h2 if ep.out_norm is None
                  else rms_norm(h2, ep.out_norm, llm.norm_eps))
            xh = xh.astype(jnp.bfloat16)
            if ep.lm_head_lr is not None:
                u, v = ep.lm_head_lr
                hr = qmatmul(xh, u, backend=backend).astype(jnp.bfloat16)
                y = qmatmul(hr, v, backend=backend).astype(jnp.float32)
            else:
                y = qmatmul(xh, ep.lm_head,
                            backend=backend).astype(jnp.float32)
            if argmax:
                return jnp.argmax(y, axis=-1).astype(jnp.int32)
            return y
        first = (dict(x=h2) if ep.out_norm is None
                 else dict(norm=(h2, ep.out_norm)))
        if ep.lm_head_lr is not None:
            u, v = ep.lm_head_lr
            hr = fused_linear(u, eps=llm.norm_eps, backend=backend,
                              **first)
            return fused_linear(v, x=hr, argmax=argmax, backend=backend)
        return fused_linear(ep.lm_head, eps=llm.norm_eps, argmax=argmax,
                            backend=backend, **first)

    def gathered(y):
        """Local vocab shard -> full [rows, vocab] logits."""
        if vocab_sharded:
            return jax.lax.all_gather(y, tp_axis, axis=-1, tiled=True)
        return y

    if logits_mode == "none":
        logits = jnp.zeros((S, 0), jnp.float32)
    elif logits_mode == "argmax":
        # greedy draft: the [S, vocab] logits never materialize — the
        # head kernel returns the per-slot best token directly (with a
        # vocab-sharded head, gather the shard logits and argmax here)
        if vocab_sharded:
            lg = gathered(head_out(x[:, -1, :]))
            logits = jnp.argmax(lg[:, :llm.vocab_size],
                                axis=-1).astype(jnp.int32)
        else:
            logits = head_out(x[:, -1, :], argmax=True)
    elif logits_mode == "last":
        logits = gathered(head_out(x[:, -1, :]))
    else:
        logits = gathered(head_out(x.reshape(S * Tq, -1))).reshape(
            S, Tq, -1)
    if window:
        return logits, feature_out, kv, new_blocks
    return logits, feature_out, kv


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "e_llm", "n_steps", "k", "backend", "sample",
                     "tp_axis", "fwd_t"),
    donate_argnums=(2, 3),
)
def eagle_spec_scan(tparams: LlamaParams, eparams: EagleParams,
                    t_kv: KVCache, e_kv: KVCache, root: jax.Array,
                    root_feat: jax.Array, t_llm: LLMConfig,
                    e_llm: LLMConfig, n_steps: int, k: int,
                    backend: str = "auto",
                    active: jax.Array | None = None,
                    rngs: jax.Array | None = None,
                    temp: jax.Array | None = None,
                    top_k: jax.Array | None = None,
                    top_p: jax.Array | None = None,
                    sample: bool = False,
                    tp_axis: str | None = None,
                    fwd_t=None):
    """n_steps BATCHED EAGLE chain-speculation steps in one dispatch
    (every scheduler slot at once — speculation composes with
    continuous batching; the reference serializes its single-stream
    spec behind a mutex, spec_model.hpp:96-113).

    root: [S] int32 last committed token per slot (position p_s, not
    yet fed to the target); root_feat: [S, dim] the target feature at
    p_s - 1 (the feature whose logits sampled `root`). sample=True
    runs STOCHASTIC speculative sampling: the head SAMPLES each draft
    from its own post-transform distribution q (slot temp/top-k/top-p),
    acceptance is min(1, p/q) rejection sampling with residual
    resampling — exactly distributed as vanilla target sampling, and at
    temperature accepts 1 - TV(p, q) per position instead of
    p(argmax_q) (chain.py::chain_spec_sample_scan's scheme applied to
    the feature-level head). sample=False is greedy argmax everywhere.

    Returns (emitted [n_steps, S, k+1], counts [n_steps, S], t_kv,
    e_kv, root, root_feat, rngs): step i of slot s emitted
    emitted[i, s, :counts[i, s]].

    Per step: k sequential head forwards draft a chain per slot; ONE
    batched target verify (logits + true features via
    return_final_hidden); acceptance per slot; the head cache drops
    ALL k drafted entries and is re-prefilled with the accepted tokens
    paired with TRUE features (one padded Tq=k+1 head forward), so its
    state always reflects target features exactly.
    """
    from ..sampling.sampler import categorical_from_dist, sample_dist_batched

    # window verify (chain.py scheme): the TARGET cache buffers stay
    # LOOP-INVARIANT across spec steps — each verify's k+1 new K/V land
    # in a carried [n_steps*(k+1)]-lane window read by attention as a
    # validity-masked softmax partition; acceptance flips lane validity
    # and ONE post-scan scatter commits (valid lanes hold unique
    # positions). The HEAD cache windows too (r4): each step owns
    # 2k+1 head lanes — k DRAFT lanes (positions c..c+k-1, draft-
    # feature K/V, valid only while this step drafts) + k+1 COMMIT
    # lanes (the true-feature re-prefill, valid per acceptance) — so
    # at serving batch the head buffers dodge the same carried-scatter
    # cliff (they cross 2^25 bytes at S>=8, T>=4096).
    from ..engine import loops as _loops

    injected = fwd_t is not None
    use_window = (not injected
                  and _loops._DECODE_LOOP_DEFAULT == "window"
                  and _loops.window_eligible(t_kv, tparams)
                  and n_steps * (k + 1) <= 1024)
    import os as _os

    e_window = (use_window and e_kv.quantized
                and _os.environ.get("POWERSERVE_EAGLE_HEAD_WINDOW",
                                    "1") != "0")

    # tp_axis (parallel/tp.py tp_eagle_spec_scan): the scan runs inside
    # a shard_map — t_llm/e_llm hold LOCAL head counts, params are
    # localized shards, and both forwards thread the megatron axis
    efwd = functools.partial(eagle_forward, tp_axis=tp_axis)
    # fwd_t: injectable TARGET forward (static) — the pipeline-parallel
    # scheduler passes a pp_forward partial (eagle x pp: the verify
    # runs through the staged pipeline while the tiny head + its cache
    # run replicated on every stage off the psum-replicated features).
    # pp_forward has no argmax_all mode, so the greedy verify computes
    # the argmax outside from logits_mode="all".
    tfwd = fwd_t if injected else functools.partial(forward,
                                                    tp_axis=tp_axis)

    S = root.shape[0]
    V = t_llm.vocab_size
    if active is None:
        active = jnp.ones(S, bool)
    if rngs is None:
        rngs = jnp.zeros((S, 2), jnp.uint32)
    if temp is None:
        temp = jnp.zeros(S, jnp.float32)  # greedy dists for sample=False
        top_k = jnp.zeros(S, jnp.int32)
        top_p = jnp.ones(S, jnp.float32)
    lanes = jnp.arange(k + 1)
    W = n_steps * (k + 1)
    We = n_steps * (2 * k + 1)  # head lanes: k draft + k+1 commit / step
    # greedy drafts take the fused argmax head (logits never leave the
    # kernel) when the head's output width is exactly the vocab
    head_n = (eparams.lm_head_lr[1].out_features
              if eparams.lm_head_lr is not None
              else eparams.lm_head.out_features)
    greedy_am = (not sample) and head_n == V

    def spec_step(carry, i):
        if use_window:
            (t_pos, wins, valid, lane_pos), e_st, root, root_feat, \
                rngs = carry
            c = t_pos.astype(jnp.int32)
        else:
            t_kv_c, e_st, root, root_feat, rngs = carry
            c = t_kv_c.pos.astype(jnp.int32)  # [S] committed length p
        if e_window:
            e_pos, e_wins, e_valid, e_lane_pos = e_st
            e_base = i * (2 * k + 1)
        else:
            e_kv_c = e_st
        split = jax.vmap(lambda r: jax.random.split(r, 4))(rngs)
        new_rngs, draft_key, u_key, res_key = (split[:, 0], split[:, 1],
                                               split[:, 2], split[:, 3])

        # -- 1. draft k tokens per slot with the head ------------------
        if e_window:
            def draft_body(dc, j):
                tok, feat, epos, ewins, eval_, dk = dc
                pos = jnp.where(active, epos.astype(jnp.int32),
                                -1)[:, None]
                e_kvi = dataclasses.replace(e_kv, pos=epos)
                logits, feat_out, kvo, blk = efwd(
                    eparams, e_llm, e_kvi, tok[:, None], feat[:, None, :],
                    pos, active=active, backend=backend,
                    logits_mode="argmax" if greedy_am else "last",
                    kv_update="window", inflight=ewins + (eval_,))
                ewins = _loops.push_kv_window(ewins, blk, e_base + j)
                eval_ = jax.lax.dynamic_update_slice(
                    eval_, active[:, None], (0, e_base + j))
                if sample:
                    sp = jax.vmap(lambda r: jax.random.split(r, 2))(dk)
                    dk, sub = sp[:, 0], sp[:, 1]
                    q = sample_dist_batched(logits[:, :V], temp, top_k,
                                            top_p, vocab_size=V)
                    nxt = categorical_from_dist(sub, q).astype(jnp.int32)
                else:
                    q = jnp.zeros((S, V), jnp.float32)
                    nxt = (logits if greedy_am
                           else jnp.argmax(logits[:, :V],
                                           axis=-1)).astype(jnp.int32)
                return (nxt, feat_out[:, -1], kvo.pos, ewins, eval_,
                        dk), (tok, q)

            (last_tok, _, _, e_wins, e_valid, _), (fed_in, q_s) = \
                jax.lax.scan(
                    draft_body,
                    (root, root_feat, e_pos, e_wins, e_valid, draft_key),
                    jnp.arange(k))
        else:
            def draft_body(dc, _):
                tok, feat, kv, dk = dc  # tok [S], feat [S, dim]
                pos = jnp.where(active, kv.pos.astype(jnp.int32),
                                -1)[:, None]
                logits, feat_out, kv = efwd(
                    eparams, e_llm, kv, tok[:, None], feat[:, None, :],
                    pos, active=active, backend=backend,
                    logits_mode="argmax" if greedy_am else "last")
                if sample:
                    sp = jax.vmap(lambda r: jax.random.split(r, 2))(dk)
                    dk, sub = sp[:, 0], sp[:, 1]
                    q = sample_dist_batched(logits[:, :V], temp, top_k,
                                            top_p, vocab_size=V)
                    nxt = categorical_from_dist(sub, q).astype(jnp.int32)
                else:
                    q = jnp.zeros((S, V), jnp.float32)
                    nxt = (logits if greedy_am
                           else jnp.argmax(logits[:, :V],
                                           axis=-1)).astype(jnp.int32)
                return (nxt, feat_out[:, -1], kv, dk), (tok, q)

            (last_tok, _, e_kv_c, _), (fed_in, q_s) = jax.lax.scan(
                draft_body, (root, root_feat, e_kv_c, draft_key), None,
                length=k)
        # the scan collects each step's INPUT token, so fed_in =
        # [root, d0 .. d_{k-2}] and the final carry holds d_{k-1}
        fed = jnp.concatenate([fed_in, last_tok[None, :]]).T  # [S, k+1]
        q_dists = q_s.transpose(1, 0, 2)  # [S, k, V]; q_j sampled d_j

        # -- 2. one batched target verify over all chains --------------
        # (greedy verifies only need the per-position argmax — the
        # fused argmax head skips the [S, k+1, V] logits entirely)
        vmode = "all" if (sample or injected) else "argmax_all"
        positions = jnp.where(active[:, None],
                              c[:, None] + lanes[None, :], -1)
        if use_window:
            import dataclasses as _dc

            base = i * (k + 1)
            kvi = _dc.replace(t_kv, pos=t_pos)
            logits, _, blk, feats = tfwd(
                tparams, t_llm, kvi, fed, positions, active=active,
                backend=backend, logits_mode=vmode,
                return_final_hidden=True,
                kv_update="window", inflight=wins + (valid,))
            wins = _loops.push_kv_window(wins, blk, base)
            lane_pos = jax.lax.dynamic_update_slice(
                lane_pos, c[:, None] + lanes[None, :], (0, base))
        else:
            logits, t_kv_c, feats = tfwd(
                tparams, t_llm, t_kv_c, fed, positions, active=active,
                backend=backend, logits_mode=vmode,
                return_final_hidden=True)
        feats = feats.astype(jnp.float32)  # [S, k+1, dim] true features

        # -- 3. acceptance per slot ------------------------------------
        d = fed[:, 1:]  # [S, k] drafted tokens
        if sample:
            rep = lambda a: jnp.repeat(a, k + 1, axis=0)  # noqa: E731
            p_dists = sample_dist_batched(
                logits.reshape(S * (k + 1), -1)[:, :V],
                rep(temp), rep(top_k), rep(top_p),
                vocab_size=V).reshape(S, k + 1, V)
            p_at_d = jnp.take_along_axis(
                p_dists[:, :k], d[:, :, None], axis=2)[:, :, 0]
            q_at_d = jnp.take_along_axis(
                q_dists, d[:, :, None], axis=2)[:, :, 0]
            u = jax.vmap(lambda r: jax.random.uniform(r, (k,)))(u_key)
            accept = (u * q_at_d < p_at_d).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(accept, axis=1), axis=1)
            # resample: residual (p - q)^+ at the reject position, p at
            # the bonus position
            p_sel = jnp.take_along_axis(
                p_dists, n_acc[:, None, None], axis=1)[:, 0]
            q_pad = jnp.concatenate(
                [q_dists, jnp.zeros((S, 1, V), q_dists.dtype)], axis=1)
            q_sel = jnp.take_along_axis(
                q_pad, n_acc[:, None, None], axis=1)[:, 0]
            residual = jnp.maximum(p_sel - q_sel, 0.0)
            rsum = residual.sum(axis=-1, keepdims=True)
            residual = jnp.where(rsum > 1e-12,
                                 residual / jnp.maximum(rsum, 1e-30), p_sel)
            nxt = categorical_from_dist(res_key, residual).astype(jnp.int32)
            # emitted = accepted drafts then the resampled/bonus token
            sampled = jnp.where(
                lanes[None, :] < n_acc[:, None],
                jnp.concatenate([d, jnp.zeros((S, 1), jnp.int32)], axis=1),
                nxt[:, None])
        else:
            # argmax_all: [S, k+1] greedy tokens (injected pp forwards
            # return full logits instead — argmax here)
            sampled = (jnp.argmax(logits[..., :V],
                                  axis=-1).astype(jnp.int32)
                       if injected else logits)
            match = (sampled[:, :k] == d).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
        new_root = jnp.where(
            active,
            jnp.take_along_axis(sampled, n_acc[:, None], axis=1)[:, 0],
            root)
        new_root_feat = jnp.where(
            active[:, None],
            jnp.take_along_axis(feats, n_acc[:, None, None], axis=1)[:, 0],
            root_feat)  # feature at p+n_acc

        # -- 4. commit: rollback, re-prefill the head on true features -
        if use_window:
            # rollback = invalidate this step's rejected lanes
            val_step = (lanes[None, :] <= n_acc[:, None]) & active[:, None]
            valid = jax.lax.dynamic_update_slice(valid, val_step, (0, base))
            t_pos = jnp.where(active, c + n_acc + 1,
                              c).astype(t_pos.dtype)
        else:
            t_kv_c = t_kv_c.rollback(jnp.where(active, k - n_acc, 0))
        # accepted window: token at p+i pairs with TRUE feature at p+i-1
        # (root_feat for i=0, feats[i-1] after); lanes past n_acc padded
        live = lanes[None, :] <= n_acc[:, None]
        commit_pos = jnp.where(live & active[:, None],
                               c[:, None] + lanes[None, :], -1)
        commit_feats = jnp.concatenate(
            [root_feat[:, None, :], feats[:, :k]], axis=1)  # [S, k+1, dim]
        if e_window:
            # the k draft lanes retire (the commit lanes supersede
            # their positions); re-prefill from position c with the
            # window's state
            e_valid = jax.lax.dynamic_update_slice(
                e_valid, jnp.zeros((S, k), bool), (0, e_base))
            e_kvi = dataclasses.replace(
                e_kv, pos=c.astype(e_kv.pos.dtype))
            _, _, kvo, blk = efwd(
                eparams, e_llm, e_kvi, fed, commit_feats, commit_pos,
                active=active, backend=backend, logits_mode="none",
                kv_update="window", inflight=e_wins + (e_valid,))
            e_wins = _loops.push_kv_window(e_wins, blk, e_base + k)
            e_valid = jax.lax.dynamic_update_slice(
                e_valid, val_step, (0, e_base + k))
            e_lane_pos = jax.lax.dynamic_update_slice(
                e_lane_pos, commit_pos, (0, e_base + k))
            e_st = (kvo.pos, e_wins, e_valid, e_lane_pos)
        else:
            # the head wrote k entries (positions p..p+k-1); drop all
            e_kv_c = e_kv_c.rollback(jnp.where(active, k, 0))
            _, _, e_kv_c = efwd(
                eparams, e_llm, e_kv_c, fed, commit_feats, commit_pos,
                active=active, backend=backend, logits_mode="none")
            e_st = e_kv_c

        emit = jnp.where(live & active[:, None], sampled, -1)
        counts = jnp.where(active, n_acc + 1, 0)
        if use_window:
            return ((t_pos, wins, valid, lane_pos), e_st, new_root,
                    new_root_feat, new_rngs), (emit, counts)
        return ((t_kv_c, e_st, new_root, new_root_feat, new_rngs),
                (emit, counts))

    if use_window:
        wins0 = _loops.make_kv_window(t_kv, t_llm, S, W)
        st0 = (t_kv.pos, wins0, jnp.zeros((S, W), bool),
               jnp.full((S, W), -1, jnp.int32))
        e_st0 = ((e_kv.pos, _loops.make_kv_window(e_kv, e_llm, S, We),
                  jnp.zeros((S, We), bool),
                  jnp.full((S, We), -1, jnp.int32))
                 if e_window else e_kv)
        ((t_pos, wins, valid, lane_pos), e_st, root, root_feat, rngs), \
            (emitted, counts) = jax.lax.scan(
                spec_step, (st0, e_st0, root, root_feat, rngs),
                jnp.arange(n_steps))
        t_kv = _loops.commit_kv_lanes(t_kv, wins, lane_pos, valid,
                                      t_pos, t_kv.mask)
        if e_window:
            e_pos_f, e_wins_f, e_valid_f, e_lane_pos_f = e_st
            e_kv = _loops.commit_kv_lanes(e_kv, e_wins_f, e_lane_pos_f,
                                          e_valid_f, e_pos_f, e_kv.mask)
        else:
            e_kv = e_st
    else:
        (t_kv, e_kv, root, root_feat, rngs), (emitted, counts) = \
            jax.lax.scan(spec_step, (t_kv, e_kv, root, root_feat, rngs),
                         None, length=n_steps)
    return emitted, counts, t_kv, e_kv, root, root_feat, rngs


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "e_llm", "n_steps", "tree_key", "backend",
                     "sample", "tp_axis", "fwd_t"),
    donate_argnums=(2, 3),
)
def eagle_tree_spec_scan(tparams: LlamaParams, eparams: EagleParams,
                         t_kv: KVCache, e_kv: KVCache, root: jax.Array,
                         root_feat: jax.Array, t_llm: LLMConfig,
                         e_llm: LLMConfig, n_steps: int, tree_key: tuple,
                         backend: str = "auto",
                         active: jax.Array | None = None,
                         rngs: jax.Array | None = None,
                         temp: jax.Array | None = None,
                         top_k: jax.Array | None = None,
                         top_p: jax.Array | None = None,
                         sample: bool = False,
                         tp_axis: str | None = None,
                         fwd_t=None):
    """Batched EAGLE speculation over a static TREE topology (EAGLE-2
    style): the head drafts every tree level in one batched forward
    (siblings take the head's rank-r tokens), ONE target forward
    verifies the whole tree with the ancestor intra-mask, and the
    acceptance walk follows matching children (device_tree.py's walk,
    reusing its TreeTemplate). Trees hedge the head's top-k at each
    depth, lifting tokens/step over chains at equal verify cost.

    root [S] / root_feat [S, dim] as in eagle_spec_scan. tree_key: a
    TreeTemplate.key(). Returns (emitted [n_steps, S, max_depth+1],
    counts [n_steps, S], t_kv, e_kv, root, root_feat, rngs).

    Head-cache bookkeeping differs from device_tree: drafted head
    entries are ALL dropped after verify and the accepted chain is
    re-prefilled with TRUE target features (the head never needs the
    deepest level forwarded — its nodes have no children — so only
    N - |last level| head entries are written per step).
    """
    from .device_tree import (
        TreeTemplate,
        _level_visibility,
        _wor_accept_walk,
        _wor_emit,
    )

    # tp_axis: see eagle_spec_scan — scan runs inside a shard_map.
    # fwd_t: injectable target forward (eagle x pp TREES — pp_forward
    # partial; the verify threads cache_positions + the ancestor
    # intra_mask through the staged pipeline, the head stays
    # replicated with vis_override level drafts)
    injected = fwd_t is not None
    efwd = functools.partial(eagle_forward, tp_axis=tp_axis)
    tfwd = fwd_t if injected else functools.partial(forward,
                                                    tp_axis=tp_axis)

    tpl = TreeTemplate(*tree_key)
    N, Dp = tpl.n_nodes, tpl.max_depth
    S = root.shape[0]
    dim = root_feat.shape[-1]
    if active is None:
        active = jnp.ones(S, bool)
    if rngs is None:
        rngs = jnp.zeros((S, 2), jnp.uint32)
    wor = sample == "wor"
    V = t_llm.vocab_size
    if wor:
        assert temp is not None and top_k is not None and top_p is not None
        from ..sampling.sampler import sample_dist_batched
    depths = jnp.asarray(tpl.depths)
    idx_arr = jnp.arange(N, dtype=jnp.int32)
    child_tab = jnp.asarray(tpl.child_table)
    anc = jnp.asarray(tpl.anc)
    T = t_kv.max_seq
    n_drafted = sum(len(tpl.levels[d]) for d in range(Dp))  # head entries

    # window verify (chain.py scheme, tree-shaped): the TARGET cache
    # buffers stay LOOP-INVARIANT — each verify's N tree nodes land in
    # N carried window lanes; acceptance marks the path nodes' lanes
    # valid with lane_pos = c + depth(node) (their COMPACTED final
    # positions — the path has one node per depth, so valid lanes hold
    # unique positions), which replaces BOTH the rollback and the
    # commit_tokens gather-compaction. One post-scan scatter commits.
    from ..engine import loops as _loops

    use_window = (not injected
                  and _loops._DECODE_LOOP_DEFAULT == "window"
                  and _loops.window_eligible(t_kv, tparams)
                  and n_steps * N <= 1024)
    W_win = n_steps * N
    # HEAD-cache window (r5, the last carried cache): per spec step the
    # head owns n_drafted DRAFT lanes (levels 0..Dp-1, valid only
    # intra-step via PER-QUERY ancestor visibility — the window-mode
    # replacement for vis_override) + Dp+1 COMMIT lanes (the
    # true-feature re-prefill, valid per acceptance at compacted
    # positions). One post-scan scatter commits; rollback is lane
    # invalidation. POWERSERVE_EAGLE_HEAD_WINDOW=0 restores the carry.
    import os as _os

    e_window = (use_window and e_kv.quantized
                and _os.environ.get("POWERSERVE_EAGLE_HEAD_WINDOW",
                                    "1") != "0")
    lanes_per = n_drafted + Dp + 1
    We = n_steps * lanes_per
    if e_window:
        # _ewritten[d][n]: drafted node n's lane exists when level d
        # drafts (BFS order puts all drafted nodes first: 0..n_drafted)
        _ewritten = []
        acc_nodes: list[int] = []
        for d in range(Dp):
            w = np.zeros(n_drafted, bool)
            w[acc_nodes] = True
            _ewritten.append(w)
            acc_nodes.extend(int(n) for n in tpl.levels[d])

    def _on_path(chain_m):
        """[S, Dp+1] accepted node ids (-1 dead) -> [S, N] bool."""
        idx = jnp.maximum(chain_m, 0)
        upd = chain_m >= 0
        return jax.vmap(
            lambda i_, u: jnp.zeros((N,), bool).at[i_].max(u))(idx, upd)

    e_kv_inv = e_kv  # loop-invariant head buffers when e_window

    def _e_commit(e_wins, e_valid, e_lane_pos, base_e, fed, cfeats,
                  cpos, live):
        """Window-mode commit re-prefill: the accepted chain's head
        entries land in this step's Dp+1 COMMIT lanes (true features,
        compacted positions); the step's draft lanes were never marked
        valid, so no rollback is needed."""
        cw = jnp.broadcast_to(e_valid[:, None, :], (S, Dp + 1, We))
        _, _, _, blk = efwd(
            eparams, e_llm, e_kv_inv, fed, cfeats, cpos,
            active=active, backend=backend, logits_mode="none",
            fuse_layers=_TREE_FUSE[0],
            kv_update="window", inflight=e_wins + (cw,))
        e_wins = _loops.push_kv_window(e_wins, blk, base_e + n_drafted)
        e_valid = jax.lax.dynamic_update_slice(
            e_valid, live & active[:, None], (0, base_e + n_drafted))
        e_lane_pos = jax.lax.dynamic_update_slice(
            e_lane_pos, cpos, (0, base_e + n_drafted))
        return e_wins, e_valid, e_lane_pos

    def spec_step(carry, i):
        if use_window:
            (t_pos, wins, valid, lane_pos), e_st, root, root_feat, \
                rngs = carry
            c = t_pos.astype(jnp.int32)
            base = i * N
            if e_window:
                e_wins, e_valid, e_lane_pos = e_st
                base_e = i * lanes_per
            else:
                e_kv = e_st
        else:
            t_kv_c, e_kv, root, root_feat, rngs = carry
            c = t_kv_c.pos.astype(jnp.int32)  # [S] committed length
        if e_window:
            e_kv = e_kv_inv  # loop-invariant head buffers (closure)
        mask0 = e_kv.mask  # committed visibility BEFORE this tree

        if wor:
            split = jax.vmap(lambda r: jax.random.split(r, 3 * Dp + 2))(
                rngs)
            wor_rngs = split[:, 0]
            g_keys = split[:, 1:1 + Dp]
            u_keys = split[:, 1 + Dp:1 + 2 * Dp]
            r_keys = split[:, 1 + 2 * Dp:]
            q_dists = jnp.zeros((S, N, V), jnp.float32)

        tokens = jnp.zeros((S, N), jnp.int32).at[:, 0].set(root)
        # per-node input feature (feature-level autoregression: node i
        # consumes its parent's predicted feature; the root consumes
        # the TRUE feature that sampled it)
        feats_in = jnp.zeros((S, N, dim), jnp.float32
                             ).at[:, 0].set(root_feat)
        # -- draft levels 0..Dp-1 with the head ------------------------
        for d in range(Dp):
            lev = tpl.levels[d]
            toks_l = tokens[:, lev]
            rope = jnp.where(active[:, None],
                             c[:, None] + depths[lev][None, :], -1)
            cpos = jnp.where(active[:, None],
                             c[:, None] + jnp.asarray(lev)[None, :], -1)
            if e_window:
                ln = len(lev)
                # prior steps' commit lanes visible to every query;
                # this step's draft lanes per static ancestor masks
                prev_vis = jnp.broadcast_to(e_valid[:, None, :],
                                            (S, ln, We))
                step_vis = jnp.asarray(
                    tpl.anc[lev][:, :n_drafted] & _ewritten[d][None, :])
                step_vis = (jnp.broadcast_to(step_vis[None],
                                             (S, ln, n_drafted))
                            & active[:, None, None])
                win_vis = jax.lax.dynamic_update_slice(
                    prev_vis, step_vis, (0, 0, base_e))
                logits, feat_out, _, blk = efwd(
                    eparams, e_llm, e_kv, toks_l, feats_in[:, lev], rope,
                    cache_positions=cpos,
                    intra_mask=jnp.eye(ln, dtype=bool), active=active,
                    backend=backend, logits_mode="all",
                    fuse_layers=_TREE_FUSE[0], fuse_head=_TREE_FUSE[1],
                    kv_update="window", inflight=e_wins + (win_vis,))
                e_wins = _loops.push_kv_window(e_wins, blk,
                                               base_e + int(lev[0]))
            else:
                vis = _level_visibility(mask0, tpl.anc[lev], c, T)
                logits, feat_out, e_kv = efwd(
                    eparams, e_llm, e_kv, toks_l, feats_in[:, lev], rope,
                    cache_positions=cpos, vis_override=vis, active=active,
                    backend=backend, logits_mode="all",
                    fuse_layers=_TREE_FUSE[0], fuse_head=_TREE_FUSE[1])
            w = tpl.level_topk[d]
            if wor:
                # children = WOR samples from the head's post-transform
                # dist (Gumbel top-k); verification's recursive
                # rejection assumes exactly this draw order
                ln = len(lev)
                repl = lambda a: jnp.repeat(a, ln, axis=0)  # noqa: E731
                q_rows = sample_dist_batched(
                    logits.reshape(S * ln, -1)[:, :V], repl(temp),
                    repl(top_k), repl(top_p),
                    vocab_size=V).reshape(S, ln, V)
                q_dists = q_dists.at[:, lev].set(q_rows)
                g = jax.vmap(lambda r: jax.random.gumbel(r, (ln, V)))(
                    g_keys[:, d])
                scores = jnp.where(q_rows > 0, jnp.log(q_rows) + g,
                                   -jnp.inf)
                _, top_ids = jax.lax.top_k(scores, w)
            else:
                _, top_ids = jax.lax.top_k(
                    logits[:, :, :t_llm.vocab_size], w)  # [S, len(lev), w]
            for row, child, r in tpl.assignments[d]:
                tokens = tokens.at[:, child].set(
                    top_ids[:, row, r].astype(jnp.int32))
                feats_in = feats_in.at[:, child].set(feat_out[:, row])

        # -- one target verify over the whole tree ---------------------
        vmode = "all" if (sample or injected) else "argmax_all"
        rope_v = jnp.where(active[:, None], c[:, None] + depths[None, :], -1)
        cpos_v = jnp.where(active[:, None], c[:, None] + idx_arr[None, :], -1)
        if use_window:
            kvi = dataclasses.replace(t_kv, pos=t_pos)
            logits, _, blk, feats_true = tfwd(
                tparams, t_llm, kvi, tokens, rope_v,
                cache_positions=cpos_v, intra_mask=anc, active=active,
                backend=backend, logits_mode=vmode,
                return_final_hidden=True,
                kv_update="window", inflight=wins + (valid,))
            wins = _loops.push_kv_window(wins, blk, base)
        else:
            logits, t_kv_c, feats_true = tfwd(
                tparams, t_llm, t_kv_c, tokens, rope_v,
                cache_positions=cpos_v, intra_mask=anc, active=active,
                backend=backend, logits_mode=vmode,
                return_final_hidden=True)
        feats_true = feats_true.astype(jnp.float32)  # [S, N, dim]
        if wor:
            repn = lambda a: jnp.repeat(a, N, axis=0)  # noqa: E731
            p_dists = sample_dist_batched(
                logits.reshape(S * N, -1)[:, :V], repn(temp), repn(top_k),
                repn(top_p), vocab_size=V).reshape(S, N, V)
            chain_m, n_acc, final_tok = _wor_accept_walk(
                tokens, q_dists, p_dists, tpl, child_tab, active,
                u_keys, r_keys, root)
            emit, new_root = _wor_emit(tokens, chain_m, n_acc, final_tok,
                                       active, root)
            # the next root token was sampled at the stop node: pair it
            # with that node's TRUE target feature
            stop_node = jnp.max(jnp.where(chain_m >= 0, chain_m, 0),
                                axis=1)
            new_root_feat = jnp.where(
                active[:, None],
                jnp.take_along_axis(
                    feats_true, stop_node[:, None, None], axis=1)[:, 0],
                root_feat)

            n_commit = jnp.where(active, n_acc + 1, 0)
            if use_window:
                # accepted path nodes own lanes at their compacted
                # positions; everything else stays invalid
                valid = jax.lax.dynamic_update_slice(
                    valid, _on_path(chain_m) & active[:, None], (0, base))
                lane_pos = jax.lax.dynamic_update_slice(
                    lane_pos,
                    jnp.where(active[:, None],
                              c[:, None] + depths[None, :], -1), (0, base))
                t_pos = jnp.where(active, c + n_acc + 1,
                                  c).astype(t_kv.pos.dtype)
            else:
                t_kv_c = t_kv_c.rollback(
                    t_kv_c.pos.astype(jnp.int32) - c, active=active)
                src = jnp.where(chain_m >= 0, c[:, None] + chain_m, -1)
                t_kv_c = t_kv_c.commit_tokens(jnp.arange(S), src, n_commit)
            if not e_window:
                e_kv = e_kv.rollback(jnp.where(active, n_drafted, 0))
            fed_chain = jnp.take_along_axis(
                tokens, jnp.maximum(chain_m, 0), axis=1)
            pred = jnp.maximum(chain_m[:, :-1], 0)
            feats_pred = jnp.take_along_axis(
                feats_true, pred[:, :, None], axis=1)
            commit_feats = jnp.concatenate(
                [root_feat[:, None, :], feats_pred], axis=1)
            lanes = jnp.arange(Dp + 1)
            live = lanes[None, :] <= n_acc[:, None]
            commit_pos = jnp.where(live & active[:, None],
                                   c[:, None] + lanes[None, :], -1)
            if e_window:
                e_wins, e_valid, e_lane_pos = _e_commit(
                    e_wins, e_valid, e_lane_pos, base_e, fed_chain,
                    commit_feats, commit_pos, live)
                e_st = (e_wins, e_valid, e_lane_pos)
                return (((t_pos, wins, valid, lane_pos), e_st, new_root,
                         new_root_feat, wor_rngs), (emit, n_commit))
            _, _, e_kv = efwd(
                eparams, e_llm, e_kv, fed_chain, commit_feats, commit_pos,
                active=active, backend=backend, logits_mode="none",
                fuse_layers=_TREE_FUSE[0])
            if use_window:
                return (((t_pos, wins, valid, lane_pos), e_kv, new_root,
                         new_root_feat, wor_rngs), (emit, n_commit))
            return ((t_kv_c, e_kv, new_root, new_root_feat, wor_rngs),
                    (emit, n_commit))
        if sample:
            from ..sampling.sampler import sample_logits_batched

            split = jax.vmap(lambda r: jax.random.split(r, N + 1))(rngs)
            new_rngs = split[:, 0]
            keys = split[:, 1:].reshape(S * N, 2)
            rep = lambda a: jnp.repeat(a, N, axis=0)  # noqa: E731
            sampled = sample_logits_batched(
                keys[0], logits.reshape(S * N, -1)[:, :t_llm.vocab_size],
                rep(temp), rep(top_k), rep(top_p),
                vocab_size=t_llm.vocab_size, keys=keys,
            ).astype(jnp.int32).reshape(S, N)
        else:
            new_rngs = rngs
            # argmax_all: [S, N] greedy tokens (injected pp forwards
            # return full logits instead — argmax here)
            sampled = (jnp.argmax(logits[..., :V],
                                  axis=-1).astype(jnp.int32)
                       if injected else logits)

        # -- acceptance walk over the static child table ----------------
        cur = jnp.zeros(S, jnp.int32)
        alive = jnp.ones(S, bool)
        chain = [cur]
        for _ in range(Dp):
            cand = child_tab[cur]  # [S, Cmax]
            cand_tok = jnp.take_along_axis(tokens, jnp.maximum(cand, 0),
                                           axis=1)
            tgt = jnp.take_along_axis(sampled, cur[:, None], axis=1)
            m = (cand >= 0) & (cand_tok == tgt) & alive[:, None]
            has = m.any(axis=1)
            pick = jnp.argmax(m, axis=1)
            child = jnp.take_along_axis(cand, pick[:, None], axis=1)[:, 0]
            cur = jnp.where(has, child, cur)
            alive = alive & has
            chain.append(jnp.where(has, child, -1))
        chain_m = jnp.stack(chain, axis=1)  # [S, Dp+1] node ids (-1 dead)
        n_acc = jnp.sum(chain_m[:, 1:] >= 0, axis=1)

        emit = jnp.take_along_axis(sampled, jnp.maximum(chain_m, 0), axis=1)
        emit = jnp.where((chain_m >= 0) & active[:, None], emit, -1)
        new_root = jnp.where(
            active,
            jnp.take_along_axis(sampled, cur[:, None], axis=1)[:, 0], root)
        new_root_feat = jnp.where(
            active[:, None],
            jnp.take_along_axis(
                feats_true, cur[:, None, None], axis=1)[:, 0], root_feat)

        # -- commit: target compacts the chain; head re-prefills --------
        n_commit = jnp.where(active, n_acc + 1, 0)
        if use_window:
            valid = jax.lax.dynamic_update_slice(
                valid, _on_path(chain_m) & active[:, None], (0, base))
            lane_pos = jax.lax.dynamic_update_slice(
                lane_pos,
                jnp.where(active[:, None],
                          c[:, None] + depths[None, :], -1), (0, base))
            t_pos = jnp.where(active, c + n_acc + 1,
                              c).astype(t_kv.pos.dtype)
        else:
            t_kv_c = t_kv_c.rollback(t_kv_c.pos.astype(jnp.int32) - c,
                                     active=active)
            src = jnp.where(chain_m >= 0, c[:, None] + chain_m, -1)
            t_kv_c = t_kv_c.commit_tokens(jnp.arange(S), src, n_commit)
        # head drafted n_drafted entries; drop them all, re-prefill the
        # accepted chain paired with TRUE features of its predecessors
        if not e_window:
            e_kv = e_kv.rollback(jnp.where(active, n_drafted, 0))
        fed_chain = jnp.take_along_axis(tokens, jnp.maximum(chain_m, 0),
                                        axis=1)  # [S, Dp+1]
        pred = jnp.maximum(chain_m[:, :-1], 0)  # predecessors of 1..Dp
        feats_pred = jnp.take_along_axis(
            feats_true, pred[:, :, None], axis=1)  # [S, Dp, dim]
        commit_feats = jnp.concatenate(
            [root_feat[:, None, :], feats_pred], axis=1)  # [S, Dp+1, dim]
        lanes = jnp.arange(Dp + 1)
        live = lanes[None, :] <= n_acc[:, None]
        commit_pos = jnp.where(live & active[:, None],
                               c[:, None] + lanes[None, :], -1)
        counts = n_commit
        if e_window:
            e_wins, e_valid, e_lane_pos = _e_commit(
                e_wins, e_valid, e_lane_pos, base_e, fed_chain,
                commit_feats, commit_pos, live)
            e_st = (e_wins, e_valid, e_lane_pos)
            return (((t_pos, wins, valid, lane_pos), e_st, new_root,
                     new_root_feat, new_rngs), (emit, counts))
        _, _, e_kv = efwd(
            eparams, e_llm, e_kv, fed_chain, commit_feats, commit_pos,
            active=active, backend=backend, logits_mode="none",
            fuse_layers=_TREE_FUSE[0])

        if use_window:
            return (((t_pos, wins, valid, lane_pos), e_kv, new_root,
                     new_root_feat, new_rngs), (emit, counts))
        return ((t_kv_c, e_kv, new_root, new_root_feat, new_rngs),
                (emit, counts))

    if use_window:
        wins0 = _loops.make_kv_window(t_kv, t_llm, S, W_win)
        st0 = (t_kv.pos, wins0, jnp.zeros((S, W_win), bool),
               jnp.full((S, W_win), -1, jnp.int32))
        e_st0 = ((_loops.make_kv_window(e_kv, e_llm, S, We),
                  jnp.zeros((S, We), bool),
                  jnp.full((S, We), -1, jnp.int32))
                 if e_window else e_kv)
        ((t_pos, wins, valid, lane_pos), e_st, root, root_feat, rngs), \
            (emitted, counts) = jax.lax.scan(
                spec_step, (st0, e_st0, root, root_feat, rngs),
                jnp.arange(n_steps))
        t_kv = _loops.commit_kv_lanes(t_kv, wins, lane_pos, valid,
                                      t_pos, t_kv.mask)
        if e_window:
            e_wins_f, e_valid_f, e_lane_pos_f = e_st
            e_kv = _loops.commit_kv_lanes(e_kv, e_wins_f, e_lane_pos_f,
                                          e_valid_f, t_pos, e_kv.mask)
        else:
            e_kv = e_st
    else:
        (t_kv, e_kv, root, root_feat, rngs), (emitted, counts) = \
            jax.lax.scan(spec_step, (t_kv, e_kv, root, root_feat, rngs),
                         jnp.arange(n_steps))
    return emitted, counts, t_kv, e_kv, root, root_feat, rngs


class EagleChainEngine:
    """Host wrapper: prefill target + head, then emit tokens in blocks
    of on-device EAGLE steps (one dispatch per block) — the EAGLE
    analogue of chain.ChainSpecEngine. Pass `template` (a
    device_tree.TreeTemplate) for EAGLE-2-style tree drafting instead
    of a k-chain."""

    def __init__(self, target_params: LlamaParams, target_cfg: ModelConfig,
                 eagle_params: EagleParams, eagle_llm: LLMConfig,
                 k: int = 4, block_steps: int = 8, max_seq: int = 0,
                 kv_dtype: str = "int8", backend: str = "auto",
                 template=None):
        self.tp, self.tcfg = target_params, target_cfg
        self.ep, self.e_llm = eagle_params, eagle_llm
        self.t_llm = target_cfg.llm
        self.k = k
        self.template = template
        self.block_steps = block_steps
        self.backend = backend
        self.max_seq = max_seq or target_cfg.llm.seq_len
        self.kv_dtype = kv_dtype
        self.reset()

    def reset(self) -> None:
        t, e = self.t_llm, self.e_llm
        self.t_kv = KVCache.create(t.n_layers, 1, self.max_seq,
                                   t.n_kv_heads, t.head_size, self.kv_dtype)
        self.e_kv = KVCache.create(e.n_layers, 1, self.max_seq,
                                   e.n_kv_heads, e.head_size, self.kv_dtype)

    def prefill(self, prompt_tokens: list[int], chunk: int = 128) -> None:
        from ..engine.loops import prefill_step

        toks = np.asarray(prompt_tokens[:-1], np.int32)
        self._root = jnp.asarray([prompt_tokens[-1]], jnp.int32)
        if not len(toks):
            self._root_feat = jnp.zeros((1, self.t_llm.dim), jnp.float32)
            return
        # target prefill, keeping every chunk's final-hidden features to
        # feed the head's prefill (the head at position j consumes the
        # target feature from j-1)
        feats = []
        for off in range(0, len(toks), chunk):
            part = toks[off:off + chunk]
            pos = off + np.arange(len(part), dtype=np.int32)
            _, self.t_kv, f = forward(
                self.tp, self.t_llm, self.t_kv, jnp.asarray(part[None, :]),
                jnp.asarray(pos[None, :]), backend=self.backend,
                logits_mode="none", return_final_hidden=True)
            feats.append(f[0])
        feats = jnp.concatenate(feats, axis=0)  # [n-1, dim]
        # head prefill: token t_j pairs with feature f_{j-1}; position 0
        # has no prior feature — EAGLE uses zeros there
        dim = feats.shape[-1]
        head_feats = jnp.concatenate(
            [jnp.zeros((1, dim), feats.dtype), feats[:-1]], axis=0)
        for off in range(0, len(toks), chunk):
            part = toks[off:off + chunk]
            pos = off + np.arange(len(part), dtype=np.int32)
            _, _, self.e_kv = eagle_forward(
                self.ep, self.e_llm, self.e_kv, jnp.asarray(part[None, :]),
                head_feats[off:off + len(part)][None], jnp.asarray(pos[None, :]),
                backend=self.backend, logits_mode="none")
        self._root_feat = feats[-1:].astype(jnp.float32)  # [1, dim]

    def generate(self, prompt_tokens: list[int], n_predict: int,
                 stop_fn=None, stats: SpecStats | None = None):
        stats = stats if stats is not None else SpecStats()
        tpl = self.template
        per_step = (tpl.max_depth + 1) if tpl is not None else (self.k + 1)
        drafted = (tpl.n_nodes - 1) if tpl is not None else self.k
        self.prefill(prompt_tokens)
        out = 0
        while out < n_predict:
            room = self.max_seq - int(np.asarray(self.t_kv.pos)[0])
            need = self.block_steps * per_step + (
                tpl.n_nodes if tpl is not None else 1)
            if room < need:
                return
            if tpl is not None:
                (tokens, counts, self.t_kv, self.e_kv, self._root,
                 self._root_feat, _) = eagle_tree_spec_scan(
                    self.tp, self.ep, self.t_kv, self.e_kv, self._root,
                    self._root_feat, self.t_llm, self.e_llm,
                    self.block_steps, tpl.key(), self.backend)
            else:
                (tokens, counts, self.t_kv, self.e_kv, self._root,
                 self._root_feat, _) = eagle_spec_scan(
                    self.tp, self.ep, self.t_kv, self.e_kv, self._root,
                    self._root_feat, self.t_llm, self.e_llm,
                    self.block_steps, self.k, self.backend)
            tokens = np.asarray(tokens)[:, 0]  # [steps, per_step]
            counts = np.asarray(counts)[:, 0]
            for i in range(self.block_steps):
                stats.steps += 1
                stats.drafted += drafted
                stats.accepted += int(counts[i]) - 1
                for t in tokens[i, :counts[i]]:
                    stats.emitted += 1
                    out += 1
                    yield int(t)
                    if (stop_fn is not None and stop_fn(int(t))) \
                            or out >= n_predict:
                        return
