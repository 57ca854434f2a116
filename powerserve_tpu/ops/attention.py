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

import jax
import jax.numpy as jnp

NEG_INF = -1e30


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
    """q: [S, Tq, H, D]; k/v: [S, T, Hkv, D]; visibility: [S, Tq, T].

    Dense for short caches; online-softmax over KV chunks beyond
    `chunk` so score memory stays O(Tq * chunk) regardless of context
    length (the reference's context is hard-capped by static NPU graph
    shapes, SURVEY §5 — here long context just streams).
    Returns [S, Tq, H * D] float32.
    """
    T = k.shape[1]
    if T <= chunk:
        return _gqa_dense(q, k, v, visibility, scale)
    return _gqa_chunked(q, k, v, visibility, scale, chunk)


def gqa_attention_quant(q: jax.Array, kq: jax.Array, ks: jax.Array,
                        vq: jax.Array, vs: jax.Array,
                        visibility: jax.Array, scale: float,
                        chunk: int = 1024) -> jax.Array:
    """Attention directly over the INT8 KV cache.

    kq/vq: [S, T, Hkv, D] int8; ks/vs: [S, T, Hkv] f32 per-(token,head)
    scales. Instead of materializing dequantized K/V ([S,T,H,D] float
    writes+reads per layer — the batched-decode bottleneck), the
    per-token scales fold into the small score/prob tensors:

      scores[.., t] = (q . kq[t]) * ks[t]
      out = sum_t (p[t] * vs[t]) . vq[t]
    """
    T = kq.shape[1]
    S, Tq, H, D = q.shape
    Hkv = kq.shape[2]
    G = H // Hkv
    if T > chunk:
        # stream via the generic chunked path on scale-folded chunks
        return _gqa_chunked_quant(q, kq, ks, vq, vs, visibility, scale,
                                  chunk)
    qg = q.reshape(S, Tq, Hkv, G, D).astype(jnp.bfloat16)
    scores = jnp.einsum("sqhgd,skhd->shgqk", qg, kq.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    ksb = ks.transpose(0, 2, 1)[:, :, None, None, :]  # [S,Hkv,1,1,T]
    scores = scores * (ksb * scale)
    vis = visibility[:, None, None, :, :]
    scores = jnp.where(vis, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    vsb = vs.transpose(0, 2, 1)[:, :, None, None, :]
    pf = (probs * vsb).astype(jnp.bfloat16)
    out = jnp.einsum("shgqk,skhd->sqhgd", pf, vq.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.reshape(S, Tq, H * D)


def _gqa_chunked_quant(q, kq, ks, vq, vs, visibility, scale, chunk):
    """Online-softmax streaming over int8 KV chunks with scale folding."""
    S, Tq, H, D = q.shape
    T = kq.shape[1]
    Hkv = kq.shape[2]
    G = H // Hkv
    pad = (-T) % chunk
    if pad:
        kq = jnp.pad(kq, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, pad), (0, 0), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, pad), (0, 0)))
        vs = jnp.pad(vs, ((0, 0), (0, pad), (0, 0)))
        visibility = jnp.pad(visibility, ((0, 0), (0, 0), (0, pad)))
    n_chunks = kq.shape[1] // chunk
    qg = q.reshape(S, Tq, Hkv, G, D).astype(jnp.bfloat16)
    kc = kq.reshape(S, n_chunks, chunk, Hkv, D).transpose(1, 0, 2, 3, 4)
    vc = vq.reshape(S, n_chunks, chunk, Hkv, D).transpose(1, 0, 2, 3, 4)
    ksc = ks.reshape(S, n_chunks, chunk, Hkv).transpose(1, 0, 2, 3)
    vsc = vs.reshape(S, n_chunks, chunk, Hkv).transpose(1, 0, 2, 3)
    visc = visibility.reshape(S, Tq, n_chunks, chunk).transpose(2, 0, 1, 3)

    m0 = jnp.full((S, Hkv, G, Tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((S, Hkv, G, Tq), jnp.float32)
    o0 = jnp.zeros((S, Hkv, G, Tq, D), jnp.float32)

    def body(carry, inputs):
        m, l, o = carry
        k_i, v_i, ks_i, vs_i, vis_i = inputs
        s_i = jnp.einsum("sqhgd,skhd->shgqk", qg, k_i.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        s_i = s_i * (ks_i.transpose(0, 2, 1)[:, :, None, None, :] * scale)
        s_i = jnp.where(vis_i[:, None, None, :, :], s_i, NEG_INF)
        m_new = jnp.maximum(m, s_i.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s_i - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        pf = (p * vs_i.transpose(0, 2, 1)[:, :, None, None, :]
              ).astype(jnp.bfloat16)
        pv = jnp.einsum("shgqk,skhd->shgqd", pf, v_i.astype(jnp.bfloat16),
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
    Hkv = k.shape[2]
    G = H // Hkv
    qg = q.reshape(S, Tq, Hkv, G, D).astype(jnp.bfloat16)
    scores = jnp.einsum("sqhgd,skhd->shgqk", qg, k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    scores = scores * scale
    vis = visibility[:, None, None, :, :]
    scores = jnp.where(vis, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("shgqk,skhd->sqhgd", probs.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.reshape(S, Tq, H * D)


def _gqa_chunked(q, k, v, visibility, scale, chunk):
    """Flash-style streaming softmax over KV chunks (lax.scan)."""
    S, Tq, H, D = q.shape
    T = k.shape[1]
    Hkv = k.shape[2]
    G = H // Hkv
    pad = (-T) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        visibility = jnp.pad(visibility, ((0, 0), (0, 0), (0, pad)))
    n_chunks = k.shape[1] // chunk
    qg = q.reshape(S, Tq, Hkv, G, D).astype(jnp.bfloat16)
    # chunked views: [C, S, chunk, ...]
    kc = k.reshape(S, n_chunks, chunk, Hkv, D).transpose(1, 0, 2, 3, 4)
    vc = v.reshape(S, n_chunks, chunk, Hkv, D).transpose(1, 0, 2, 3, 4)
    visc = visibility.reshape(S, Tq, n_chunks, chunk).transpose(2, 0, 1, 3)

    m0 = jnp.full((S, Hkv, G, Tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((S, Hkv, G, Tq), jnp.float32)
    o0 = jnp.zeros((S, Hkv, G, Tq, D), jnp.float32)

    def body(carry, inputs):
        m, l, o = carry
        k_i, v_i, vis_i = inputs
        s_i = jnp.einsum("sqhgd,skhd->shgqk", qg, k_i.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) * scale
        s_i = jnp.where(vis_i[:, None, None, :, :], s_i, NEG_INF)
        m_new = jnp.maximum(m, s_i.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s_i - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        pv = jnp.einsum("shgqk,skhd->shgqd", p.astype(jnp.bfloat16),
                        v_i.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        o = o * alpha[..., None] + pv
        return (m_new, l, o), None

    (m, l, o), _ = jax.lax.scan(body, (m0, l0, o0), (kc, vc, visc))
    safe_l = jnp.where(l > 0, l, 1.0)
    o = o / safe_l[..., None]
    # [S, Hkv, G, Tq, D] -> [S, Tq, H*D]
    return o.transpose(0, 3, 1, 2, 4).reshape(S, Tq, H * D)
