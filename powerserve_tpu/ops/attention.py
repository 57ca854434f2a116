"""Masked GQA attention over the INT8 KV cache.

Replaces the reference's CPU attention subgraph (norm_attention.cpp:26-162:
per-head K.Q -> softmax_ext(mask, 1/sqrt(d)) -> V.scores) and the NPU
attn_bias semantics (fp16 bias rows encoding causal AND tree masks,
causal_models.cpp:215). Here the mask is boolean and computed from the
cache's visibility mask plus an intra-batch matrix, so the same code path
serves causal decode, chunked prefill, and token-tree verification.

XLA path (einsum; fused well by XLA for decode shapes). A Pallas
flash-decode kernel can be slotted behind the same signature later.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# flash-prefill routing knob: "1" = force the Pallas kernel at every
# eligible prefill shape; "interpret" = interpret mode (CPU tests);
# unset/"0" = measured default — auto-route ONLY the one bucket the
# kernel wins (S >= 8, 32 <= Tq <= 128; see gqa_attention_quant below
# and the flash_prefill.py bench notes), XLA everywhere else
_FLASH_PREFILL = _os.environ.get("POWERSERVE_FLASH_PREFILL", "0")


def _attn_dtype():
    """bf16 operands on TPU; f32 on CPU (the CPU dot thunk can't do
    BF16xBF16=F32 for some contraction layouts)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def build_visibility(cache_mask: jax.Array, positions: jax.Array,
                     intra_mask: jax.Array | None) -> jax.Array:
    """Combine cache visibility with the new batch's intra-mask.

    cache_mask: [S, T] bool — previously appended tokens.
    positions:  [S, Tq] int32 — where the new batch's tokens were written.
    intra_mask: [Tq, Tq] bool — intra[q, j]: may query q see new token j?
                None = causal (j <= q). Tree verification passes the
                ancestor matrix (reference token_tree.cpp:82-95).
    Returns [S, Tq, T] bool.
    """
    S, T = cache_mask.shape
    Tq = positions.shape[1]
    if intra_mask is None:
        qi = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tq), 0)
        ji = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tq), 1)
        intra_mask = ji <= qi
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (S, Tq, T), 2)
    eq = t_iota == positions[:, :, None]  # [S, j, T]
    # visible_new[s, q, t] = OR_j intra[q, j] & eq[s, j, t]
    vis_new = jnp.einsum("qj,sjt->sqt", intra_mask.astype(jnp.float32),
                         eq.astype(jnp.float32)) > 0.5
    # a cache position that belongs to the new batch is governed ONLY by
    # the intra mask (its cache_mask bit is not yet advanced)
    return cache_mask[:, None, :] | vis_new


def gqa_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  visibility: jax.Array, scale: float,
                  chunk: int = 1024) -> jax.Array:
    """q: [S, Tq, H, D]; k/v: [S, Hkv, T, D] (cache layout);
    visibility: [S, Tq, T].

    Dense for short caches; online-softmax over KV chunks beyond
    `chunk` so score memory stays O(Tq * chunk) regardless of context
    length (the reference's context is hard-capped by static NPU graph
    shapes, SURVEY §5 — here long context just streams).
    Returns [S, Tq, H * D] float32.
    """
    T = k.shape[2]
    if T <= chunk:
        return _gqa_dense(q, k, v, visibility, scale)
    return _gqa_chunked(q, k, v, visibility, scale, chunk)


def gqa_attention_quant(q: jax.Array, kq: jax.Array, ks: jax.Array,
                        vq: jax.Array, vs: jax.Array,
                        visibility: jax.Array, scale: float,
                        chunk: int = 1024,
                        backend: str = "xla",
                        prefill_start: jax.Array | None = None,
                        cache_mask: jax.Array | None = None) -> jax.Array:
    """Attention directly over the INT8 KV cache.

    kq/vq: [S, Hkv, T, D] int8 (cache layout: contiguous per-head
    slabs); ks/vs: [S, Hkv, T] f32 per-(token,head) scales. Instead of
    materializing dequantized K/V (float writes+reads per layer — the
    batched-decode bottleneck), the per-token scales fold into the
    small score/prob tensors:

      scores[.., t] = (q . kq[t]) * ks[t]
      out = sum_t (p[t] * vs[t]) . vq[t]

    backend "auto"/"pallas" routes decode shapes (Tq == 1) at long
    context (T >= 2048) to the Pallas flash-decode kernel — measured
    faster than this XLA path there (flash_decode.py; e.g. 30 vs 57 us
    at S=1/T=8192 on v5e) and at worst tied. Verify shapes (Tq > 1) and
    short caches stay on XLA, which is already near the KV-bandwidth
    roofline for them.

    prefill_start/cache_mask: the standard-prefill contiguity facts
    ([S] write offsets + [S, T] committed mask) that let the Pallas
    flash-prefill kernel compute visibility in-kernel. Auto-routing
    (measured r2s4, flash_prefill.py docstring): ONLY the batched
    small-Tq bucket S >= 8 and 32 <= Tq <= 128 wins there (308 vs
    392 us at S=8/Tq=128/T=1024); every other prefill shape stays on
    the MXU-efficient XLA path. POWERSERVE_FLASH_PREFILL=1 forces the
    kernel everywhere its contiguity facts hold (re-benchmarks).
    """
    S, Tq, H, D = q.shape
    Hkv, T = kq.shape[1], kq.shape[2]
    G = H // Hkv
    if (prefill_start is not None and cache_mask is not None
            and Tq >= 32
            and (_FLASH_PREFILL in ("1", "interpret")
                 or (S >= 8 and Tq <= 128))
            and backend in ("auto", "pallas", "pallas_interpret")):
        interp = (_FLASH_PREFILL == "interpret"
                  or backend == "pallas_interpret")
        if interp or jax.default_backend() == "tpu":
            from .flash_prefill import flash_prefill_quant
            return flash_prefill_quant(q, kq, ks, vq, vs, cache_mask,
                                       prefill_start, scale,
                                       interpret=interp)
    if Tq == 1 and T >= 2048 and backend in ("auto", "pallas",
                                             "pallas_interpret"):
        interp = backend == "pallas_interpret"
        if interp or jax.default_backend() == "tpu":
            from .flash_decode import flash_decode_quant
            return flash_decode_quant(q, kq, ks, vq, vs, visibility,
                                      scale, interpret=interp)
    if T > chunk:
        # stream via the generic chunked path on scale-folded chunks
        return _gqa_chunked_quant(q, kq, ks, vq, vs, visibility, scale,
                                  chunk)
    qg = q.reshape(S, Tq, Hkv, G, D).astype(_attn_dtype())
    scores = jnp.einsum("sqhgd,shkd->shgqk", qg, kq.astype(_attn_dtype()),
                        preferred_element_type=jnp.float32)
    scores = scores * (ks[:, :, None, None, :] * scale)
    vis = visibility[:, None, None, :, :]
    scores = jnp.where(vis, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    pf = (probs * vs[:, :, None, None, :]).astype(_attn_dtype())
    out = jnp.einsum("shgqk,shkd->sqhgd", pf, vq.astype(_attn_dtype()),
                     preferred_element_type=jnp.float32)
    return out.reshape(S, Tq, H * D)


def gqa_attention_quant_sp(q: jax.Array, kq: jax.Array, ks: jax.Array,
                           vq: jax.Array, vs: jax.Array,
                           visibility: jax.Array, scale: float,
                           axis: str, chunk: int = 1024) -> jax.Array:
    """Sequence-parallel attention inside a shard_map: kq/vq/scales/
    visibility are this shard's slice of the TIME axis; each shard
    computes its unnormalized online-softmax state (m, l, o) over local
    KV, then three small collectives (pmax + 2 psum, [S,H,Tq]-sized —
    not KV-sized) merge the softmax exactly across shards. Long-context
    HBM reads split sp-ways; only per-query statistics cross ICI.
    Replicated queries; each cache position lives on exactly one shard.
    """
    S, Tq, H, D = q.shape
    Hkv = kq.shape[1]
    G = H // Hkv
    qg = q.reshape(S, Tq, Hkv, G, D).astype(_attn_dtype())
    m, l, o = _chunked_quant_mlo(qg, kq, ks, vq, vs, visibility, scale,
                                 chunk)
    m_max = jax.lax.pmax(m, axis)
    # guard fully-masked shards: exp(NEG_INF - NEG_INF) would be 1
    w = jnp.where(m > NEG_INF / 2, jnp.exp(m - m_max), 0.0)
    l_g = jax.lax.psum(l * w, axis)
    o_g = jax.lax.psum(o * w[..., None], axis)
    safe_l = jnp.where(l_g > 0, l_g, 1.0)
    out = o_g / safe_l[..., None]
    return out.transpose(0, 3, 1, 2, 4).reshape(S, Tq, H * D)


def gqa_attention_quant_deferred(q: jax.Array, kq: jax.Array, ks: jax.Array,
                                 vq: jax.Array, vs: jax.Array,
                                 cache_mask: jax.Array,
                                 knew_q: jax.Array, knew_s: jax.Array,
                                 vnew_q: jax.Array, vnew_s: jax.Array,
                                 intra_vis: jax.Array, scale: float,
                                 chunk: int = 1024) -> jax.Array:
    """Attention when the batch's K/V are NOT yet in the cache.

    The cache slabs hold only committed tokens (mask = cache_mask
    [S, T]); the in-flight batch contributes an extra [Tq] block of
    int8 K/V (knew_q/vnew_q [S, Hkv, Tq, D] + scales [S, Hkv, Tq] —
    already quantized, so numerics match the write-then-read path).
    intra_vis [S, Tq, Tq] masks the in-flight block (causal / tree
    ancestors, with padded lanes' columns off).

    This exists so the layer scan can defer all KV scatters to one
    post-scan write: slab updates inside lax.scan force XLA to
    materialize per-layer cache copies (scatter on a loop-sliced
    operand), which dominates the decode step at depth.
    Softmax runs over the concatenated [T + Tq] axis.
    """
    S, Tq, H, D = q.shape
    Hkv, T = kq.shape[1], kq.shape[2]
    G = H // Hkv
    dt = _attn_dtype()
    qg = q.reshape(S, Tq, Hkv, G, D).astype(dt)
    sn = jnp.einsum("sqhgd,shkd->shgqk", qg, knew_q.astype(dt),
                    preferred_element_type=jnp.float32)
    sn = sn * (knew_s[:, :, None, None, :] * scale)
    sn = jnp.where(intra_vis[:, None, None, :, :], sn, NEG_INF)
    if T <= chunk:
        sc = jnp.einsum("sqhgd,shkd->shgqk", qg, kq.astype(dt),
                        preferred_element_type=jnp.float32)
        sc = sc * (ks[:, :, None, None, :] * scale)
        sc = jnp.where(cache_mask[:, None, None, None, :], sc, NEG_INF)
        scores = jnp.concatenate([sc, sn], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1)
        pc = (probs[..., :T] * vs[:, :, None, None, :]).astype(dt)
        pn = (probs[..., T:] * vnew_s[:, :, None, None, :]).astype(dt)
        out = jnp.einsum("shgqk,shkd->sqhgd", pc, vq.astype(dt),
                         preferred_element_type=jnp.float32) \
            + jnp.einsum("shgqk,shkd->sqhgd", pn, vnew_q.astype(dt),
                         preferred_element_type=jnp.float32)
        return out.reshape(S, Tq, H * D)
    # long context: stream the cache, then merge the in-flight block as
    # one more online-softmax step
    m, l, o = _chunked_quant_mlo(qg, kq, ks, vq, vs,
                                 cache_mask[:, None, :].astype(bool)
                                 | jnp.zeros((S, Tq, T), bool),
                                 scale, chunk)
    m_new = jnp.maximum(m, sn.max(axis=-1))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(sn - m_new[..., None])
    l = l * alpha + p.sum(axis=-1)
    pf = (p * vnew_s[:, :, None, None, :]).astype(dt)
    pv = jnp.einsum("shgqk,shkd->shgqd", pf, vnew_q.astype(dt),
                    preferred_element_type=jnp.float32)
    o = o * alpha[..., None] + pv
    safe_l = jnp.where(l > 0, l, 1.0)
    o = o / safe_l[..., None]
    return o.transpose(0, 3, 1, 2, 4).reshape(S, Tq, H * D)


def gqa_attention_quant_sp_deferred(q: jax.Array, kq: jax.Array,
                                    ks: jax.Array, vq: jax.Array,
                                    vs: jax.Array, cache_mask: jax.Array,
                                    knew_q: jax.Array, knew_s: jax.Array,
                                    vnew_q: jax.Array, vnew_s: jax.Array,
                                    intra_vis: jax.Array, scale: float,
                                    axis: str, chunk: int = 1024
                                    ) -> jax.Array:
    """Sequence-parallel DEFERRED attention (the window decode loop
    under an "sp" shard_map axis): each shard computes its online-
    softmax state (m, l, o) over its LOCAL cache slice, folds in the
    in-flight partition (window lanes + this step's K/V block,
    replicated across sp shards — the CALLER must pre-mask each lane's
    visibility so it is True on exactly one shard: window lanes gate on
    axis_index == 0, the current block's lanes gate themselves via the
    shard-local position remap), then the exact cross-shard softmax
    merge of gqa_attention_quant_sp."""
    S, Tq, H, D = q.shape
    Hkv = kq.shape[1]
    G = H // Hkv
    dt = _attn_dtype()
    qg = q.reshape(S, Tq, Hkv, G, D).astype(dt)
    vis = jnp.broadcast_to(cache_mask[:, None, :].astype(bool),
                           (S, Tq, kq.shape[2]))
    m, l, o = _chunked_quant_mlo(qg, kq, ks, vq, vs, vis, scale, chunk)
    # in-flight partition
    sn = jnp.einsum("sqhgd,shkd->shgqk", qg, knew_q.astype(dt),
                    preferred_element_type=jnp.float32)
    sn = sn * (knew_s[:, :, None, None, :] * scale)
    sn = jnp.where(intra_vis[:, None, None, :, :], sn, NEG_INF)
    m2 = sn.max(axis=-1)
    live2 = m2 > NEG_INF / 2  # shards whose in-flight lanes are visible
    p = jnp.where(live2[..., None], jnp.exp(sn - m2[..., None]), 0.0)
    l2 = p.sum(axis=-1)
    pf = (p * vnew_s[:, :, None, None, :]).astype(dt)
    o2 = jnp.einsum("shgqk,shkd->shgqd", pf, vnew_q.astype(dt),
                    preferred_element_type=jnp.float32)
    # local merge of the two partitions (no-op where live2 is False)
    mm = jnp.maximum(m, m2)
    w1 = jnp.where(m > NEG_INF / 2, jnp.exp(m - mm), 0.0)
    w2 = jnp.where(live2, jnp.exp(m2 - mm), 0.0)
    m = jnp.where(live2, mm, m)
    l = jnp.where(live2, l * w1 + l2 * w2, l)
    o = jnp.where(live2[..., None], o * w1[..., None] + o2 * w2[..., None],
                  o)
    # cross-shard exact softmax merge
    m_max = jax.lax.pmax(m, axis)
    w = jnp.where(m > NEG_INF / 2, jnp.exp(m - m_max), 0.0)
    l_g = jax.lax.psum(l * w, axis)
    o_g = jax.lax.psum(o * w[..., None], axis)
    safe_l = jnp.where(l_g > 0, l_g, 1.0)
    out = o_g / safe_l[..., None]
    return out.transpose(0, 3, 1, 2, 4).reshape(S, Tq, H * D)


def _chunked_quant_mlo(qg, kq, ks, vq, vs, visibility, scale, chunk):
    """Unnormalized online-softmax state (m, l, o) over int8 KV chunks;
    shared by the chunked path and the deferred in-flight merge."""
    S, Tq, Hkv, G, D = qg.shape
    T = kq.shape[2]
    pad = (-T) % chunk
    if pad:
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad)))
        visibility = jnp.pad(visibility, ((0, 0), (0, 0), (0, pad)))
    n_chunks = kq.shape[2] // chunk
    kc = kq.reshape(S, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    vc = vq.reshape(S, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    ksc = ks.reshape(S, Hkv, n_chunks, chunk).transpose(2, 0, 1, 3)
    vsc = vs.reshape(S, Hkv, n_chunks, chunk).transpose(2, 0, 1, 3)
    visc = visibility.reshape(S, Tq, n_chunks, chunk).transpose(2, 0, 1, 3)

    m0 = jnp.full((S, Hkv, G, Tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((S, Hkv, G, Tq), jnp.float32)
    o0 = jnp.zeros((S, Hkv, G, Tq, D), jnp.float32)

    def body(carry, inputs):
        m, l, o = carry
        k_i, v_i, ks_i, vs_i, vis_i = inputs
        s_i = jnp.einsum("sqhgd,shkd->shgqk", qg, k_i.astype(_attn_dtype()),
                         preferred_element_type=jnp.float32)
        s_i = s_i * (ks_i[:, :, None, None, :] * scale)
        s_i = jnp.where(vis_i[:, None, None, :, :], s_i, NEG_INF)
        m_new = jnp.maximum(m, s_i.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s_i - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        pf = (p * vs_i[:, :, None, None, :]).astype(_attn_dtype())
        pv = jnp.einsum("shgqk,shkd->shgqd", pf, v_i.astype(_attn_dtype()),
                        preferred_element_type=jnp.float32)
        o = o * alpha[..., None] + pv
        return (m_new, l, o), None

    (m, l, o), _ = jax.lax.scan(body, (m0, l0, o0),
                                (kc, vc, ksc, vsc, visc))
    return m, l, o


def _gqa_chunked_quant(q, kq, ks, vq, vs, visibility, scale, chunk):
    """Online-softmax streaming over int8 KV chunks with scale folding
    ([S, Hkv, T, D] cache layout)."""
    S, Tq, H, D = q.shape
    Hkv, T = kq.shape[1], kq.shape[2]
    G = H // Hkv
    pad = (-T) % chunk
    if pad:
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad)))
        visibility = jnp.pad(visibility, ((0, 0), (0, 0), (0, pad)))
    n_chunks = kq.shape[2] // chunk
    qg = q.reshape(S, Tq, Hkv, G, D).astype(_attn_dtype())
    kc = kq.reshape(S, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    vc = vq.reshape(S, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    ksc = ks.reshape(S, Hkv, n_chunks, chunk).transpose(2, 0, 1, 3)
    vsc = vs.reshape(S, Hkv, n_chunks, chunk).transpose(2, 0, 1, 3)
    visc = visibility.reshape(S, Tq, n_chunks, chunk).transpose(2, 0, 1, 3)

    m0 = jnp.full((S, Hkv, G, Tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((S, Hkv, G, Tq), jnp.float32)
    o0 = jnp.zeros((S, Hkv, G, Tq, D), jnp.float32)

    def body(carry, inputs):
        m, l, o = carry
        k_i, v_i, ks_i, vs_i, vis_i = inputs
        s_i = jnp.einsum("sqhgd,shkd->shgqk", qg, k_i.astype(_attn_dtype()),
                         preferred_element_type=jnp.float32)
        s_i = s_i * (ks_i[:, :, None, None, :] * scale)
        s_i = jnp.where(vis_i[:, None, None, :, :], s_i, NEG_INF)
        m_new = jnp.maximum(m, s_i.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s_i - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        pf = (p * vs_i[:, :, None, None, :]).astype(_attn_dtype())
        pv = jnp.einsum("shgqk,shkd->shgqd", pf, v_i.astype(_attn_dtype()),
                        preferred_element_type=jnp.float32)
        o = o * alpha[..., None] + pv
        return (m_new, l, o), None

    (m, l, o), _ = jax.lax.scan(body, (m0, l0, o0),
                                (kc, vc, ksc, vsc, visc))
    safe_l = jnp.where(l > 0, l, 1.0)
    o = o / safe_l[..., None]
    return o.transpose(0, 3, 1, 2, 4).reshape(S, Tq, H * D)


def _gqa_dense(q, k, v, visibility, scale):
    S, Tq, H, D = q.shape
    Hkv = k.shape[1]
    G = H // Hkv
    qg = q.reshape(S, Tq, Hkv, G, D).astype(_attn_dtype())
    scores = jnp.einsum("sqhgd,shkd->shgqk", qg, k.astype(_attn_dtype()),
                        preferred_element_type=jnp.float32)
    scores = scores * scale
    vis = visibility[:, None, None, :, :]
    scores = jnp.where(vis, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("shgqk,shkd->sqhgd", probs.astype(_attn_dtype()),
                     v.astype(_attn_dtype()),
                     preferred_element_type=jnp.float32)
    return out.reshape(S, Tq, H * D)


def _gqa_chunked(q, k, v, visibility, scale, chunk):
    """Flash-style streaming softmax over KV chunks (lax.scan),
    [S, Hkv, T, D] layout."""
    S, Tq, H, D = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    G = H // Hkv
    pad = (-T) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        visibility = jnp.pad(visibility, ((0, 0), (0, 0), (0, pad)))
    n_chunks = k.shape[2] // chunk
    qg = q.reshape(S, Tq, Hkv, G, D).astype(_attn_dtype())
    # chunked views: [C, S, Hkv, chunk, D]
    kc = k.reshape(S, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(S, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    visc = visibility.reshape(S, Tq, n_chunks, chunk).transpose(2, 0, 1, 3)

    m0 = jnp.full((S, Hkv, G, Tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((S, Hkv, G, Tq), jnp.float32)
    o0 = jnp.zeros((S, Hkv, G, Tq, D), jnp.float32)

    def body(carry, inputs):
        m, l, o = carry
        k_i, v_i, vis_i = inputs
        s_i = jnp.einsum("sqhgd,shkd->shgqk", qg, k_i.astype(_attn_dtype()),
                         preferred_element_type=jnp.float32) * scale
        s_i = jnp.where(vis_i[:, None, None, :, :], s_i, NEG_INF)
        m_new = jnp.maximum(m, s_i.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s_i - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        pv = jnp.einsum("shgqk,shkd->shgqd", p.astype(_attn_dtype()),
                        v_i.astype(_attn_dtype()),
                        preferred_element_type=jnp.float32)
        o = o * alpha[..., None] + pv
        return (m_new, l, o), None

    (m, l, o), _ = jax.lax.scan(body, (m0, l0, o0), (kc, vc, visc))
    safe_l = jnp.where(l > 0, l, 1.0)
    o = o / safe_l[..., None]
    # [S, Hkv, G, Tq, D] -> [S, Tq, H*D]
    return o.transpose(0, 3, 1, 2, 4).reshape(S, Tq, H * D)
