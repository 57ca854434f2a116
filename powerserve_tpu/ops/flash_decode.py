"""Pallas flash-decode attention over the INT8 KV cache.

Decode-shape attention (small Tq) reading the quantized cache directly:
grid (slot, kv_head, T-chunk) with online-softmax state in VMEM scratch,
per-token scales folded into scores/probs (same math as
ops/attention.py::gqa_attention_quant, which remains the XLA fallback
and the golden reference in tests).

Cache layout [S, Hkv, T, D] (contiguous per-(slot, head) slabs) is what
makes the chunk DMA here a plain strided copy.

STATUS: correct on TPU (rel err <=0.003 vs the XLA path at decode and
tree-verify shapes) but currently SLOWER than XLA's scale-folded einsum
(200 vs 118 us/layer at S=8, T=1024 on v5e) — the (S, Hkv, chunks) grid
is overhead-dominated at these sizes. Kept as the foundation for
round-2 tuning (fold Hkv into one instance, double-buffer chunks);
ops/attention.py::gqa_attention_quant remains the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, vis_ref, o_ref,
            m_sc, l_sc, acc, *, n_chunks: int, G: int, Tq: int,
            scale: float):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, NEG_INF)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc[...] = jnp.zeros_like(acc)

    qx = q_ref[0, 0]  # [G*Tq, D]
    kx = k_ref[0, 0]  # [C, D] int8
    ksx = ks_ref[0, 0, :, 0]  # [C] (scales carried as [.., T, 1])
    vsx = vs_ref[0, 0, :, 0]
    vis = vis_ref[0]  # [Tq, C] uint8

    s_c = jax.lax.dot_general(
        qx, kx.astype(qx.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [G*Tq, C]
    s_c = s_c * (ksx[None, :].astype(jnp.float32) * scale)
    # rows are (g, tq) with tq minor: tile the [Tq, C] mask G times
    # (compare in i32 — Mosaic lacks u8 vector comparisons)
    vis_g = jnp.concatenate([vis] * G, axis=0).astype(jnp.int32)
    s_c = jnp.where(vis_g > 0, s_c, NEG_INF)

    m_prev = m_sc[...]  # [G*Tq, 1]-ish stored as [rows, 128]; use col 0
    m_cur = jnp.max(s_c, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev[:, :1], m_cur)
    alpha = jnp.exp(m_prev[:, :1] - m_new)
    p = jnp.exp(s_c - m_new)
    l_new = l_sc[...][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pf = (p * vsx[None, :].astype(jnp.float32)).astype(qx.dtype)
    pv = jnp.dot(pf, v_ref[0, 0].astype(qx.dtype),
                 preferred_element_type=jnp.float32)  # [G*Tq, D]
    acc[...] = acc[...] * alpha + pv
    m_sc[...] = jnp.broadcast_to(m_new, m_sc.shape)
    l_sc[...] = jnp.broadcast_to(l_new, l_sc.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        l = l_sc[...][:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc[...] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "chunk", "interpret"))
def flash_decode_quant(q: jax.Array, kq: jax.Array, ks: jax.Array,
                       vq: jax.Array, vs: jax.Array, visibility: jax.Array,
                       scale: float, chunk: int = 512,
                       interpret: bool = False) -> jax.Array:
    """q: [S, Tq, H, D]; kq/vq: [S, Hkv, T, D] int8; ks/vs: [S, Hkv, T];
    visibility: [S, Tq, T] bool. Returns [S, Tq, H*D] f32."""
    S, Tq, H, D = q.shape
    Hkv, T = kq.shape[1], kq.shape[2]
    G = H // Hkv
    C = min(chunk, T)
    if T % C != 0:
        pad = C - T % C
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad)))
        visibility = jnp.pad(visibility, ((0, 0), (0, 0), (0, pad)))
        T = T + pad
    n_chunks = T // C
    rows = G * Tq
    # [S, Hkv, G*Tq, D] with tq minor within each g block
    qg = (q.reshape(S, Tq, Hkv, G, D).transpose(0, 2, 3, 1, 4)
          .reshape(S, Hkv, rows, D).astype(jnp.bfloat16))
    vis_u8 = visibility.astype(jnp.uint8)

    kernel = functools.partial(_kernel, n_chunks=n_chunks, G=G, Tq=Tq,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(S, Hkv, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, rows, D), lambda s, h, c: (s, h, 0, 0)),
            pl.BlockSpec((1, 1, C, D), lambda s, h, c: (s, h, c, 0)),
            pl.BlockSpec((1, 1, C, 1), lambda s, h, c: (s, h, c, 0)),
            pl.BlockSpec((1, 1, C, D), lambda s, h, c: (s, h, c, 0)),
            pl.BlockSpec((1, 1, C, 1), lambda s, h, c: (s, h, c, 0)),
            pl.BlockSpec((1, Tq, C), lambda s, h, c: (s, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, D), lambda s, h, c: (s, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, Hkv, rows, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),  # running max
            pltpu.VMEM((rows, 128), jnp.float32),  # running sum
            pltpu.VMEM((rows, D), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qg, kq, ks[..., None], vq, vs[..., None], vis_u8)
    # [S, Hkv, G*Tq, D] -> [S, Tq, H*D]
    out = out.reshape(S, Hkv, G, Tq, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(S, Tq, H * D)
