"""Pallas flash-decode attention over the INT8 KV cache.

Decode-shape attention (small Tq) reading the quantized cache directly,
with per-token scales folded into scores/probs (same math as
ops/attention.py::gqa_attention_quant, which remains the XLA fallback
and the golden reference in tests).

Design (round 2): ALL kv heads are folded into one grid instance —
grid is (slot, T-chunk), not (slot, head, T-chunk). The per-instance
score matrix is [Hkv*G*Tq, Hkv*C] block-diagonal: row (h, g, tq) may
only see columns of head h. Off-diagonal blocks are masked with an
in-kernel iota compare; the data-dependent visibility mask arrives as a
precomputed additive bias laid out per chunk. The first version used a
(S, Hkv, chunks) grid whose instances did 4-row dots — far below the
8-sublane granularity, overhead-dominated (200 us/layer vs XLA's 118 at
S=8/T=1024). Folding Hkv trades ~Hkv x extra MXU MACs (idle anyway at
decode shapes) for Hkv x fewer, well-shaped instances; HBM traffic is
unchanged (each K/V byte still read once).

Cache layout [S, Hkv, T, D] (contiguous per-(slot, head) slabs) makes
the chunk DMA a plain strided copy.

Measured (v5e, marginal cost inside an on-device scan with a serial
data dependence — loop-invariant harnesses get hoisted by XLA and
report only fixed dispatch overhead):

    S  T     Tq   xla(us)  flash(us)  KV-roofline
    1  2048   1     14.6      9.6        5
    1  8192   1     56.9     30.0       20
    8  1024   1     27.5     29.7       20
    8  8192   1    230.3    210.9      164
    8  1024  12     30.3    163.6       20   <- Tq>1 stays on XLA

gqa_attention_quant routes Tq==1, T>=2048 here (backend="auto").

Replaces the role of the reference's CPU attention subgraph
(norm_attention.cpp:26-162) at decode shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, vb_ref, o_ref,
            m_sc, l_sc, acc, *, n_chunks: int, Hkv: int, G: int, Tq: int,
            C: int, scale: float, m_ref=None, l_ref=None):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, NEG_INF)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc[...] = jnp.zeros_like(acc)

    R = Hkv * G * Tq
    cols = Hkv * C
    D = q_ref.shape[-1]
    qx = q_ref[0]  # [R, D] bf16, rows (h, g, tq) tq-minor
    kx = k_ref[0].reshape(cols, D)  # [Hkv, C, D] int8 -> flat heads
    ksx = ks_ref[0, 0]  # [1, cols] f32
    vsx = vs_ref[0, 0]
    vbx = vb_ref[0, 0]  # [Tq, cols] additive visibility bias (0/-inf)

    s_c = jax.lax.dot_general(
        qx, kx.astype(qx.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [R, cols]
    s_c = s_c * (ksx * scale)
    # block-diagonal head mask: row (h, g, tq) sees only head h's columns
    hr = jax.lax.broadcasted_iota(jnp.int32, (R, cols), 0) // (G * Tq)
    hc = jax.lax.broadcasted_iota(jnp.int32, (R, cols), 1) // C
    s_c = jnp.where(hr == hc, s_c, NEG_INF)
    # visibility bias: same [Tq, cols] row pattern for every (h, g) —
    # broadcast over leading dims is layout-free
    s_c = s_c + jnp.broadcast_to(vbx[None], (Hkv * G, Tq, cols)
                                 ).reshape(R, cols)

    m_prev = m_sc[...][:, :1]  # state stored [R, 128]; col 0 is live
    m_cur = jnp.max(s_c, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s_c - m_new)
    l_new = l_sc[...][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pf = (p * vsx).astype(qx.dtype)
    pv = jnp.dot(pf, v_ref[0].reshape(cols, D).astype(qx.dtype),
                 preferred_element_type=jnp.float32)  # [R, D]
    acc[...] = acc[...] * alpha + pv
    m_sc[...] = jnp.broadcast_to(m_new, m_sc.shape)
    l_sc[...] = jnp.broadcast_to(l_new, l_sc.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        if m_ref is not None:
            # state mode: unnormalized accumulator + (m, l) out — the
            # caller merges another softmax partition (the deferred
            # in-flight K/V block) before normalizing
            o_ref[0] = acc[...].astype(o_ref.dtype)
            m_ref[0] = m_sc[...].astype(m_ref.dtype)
            l_ref[0] = l_sc[...].astype(l_ref.dtype)
        else:
            l = l_sc[...][:, :1]
            safe = jnp.where(l > 0, l, 1.0)
            o_ref[0] = (acc[...] / safe).astype(o_ref.dtype)


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
    nc = T // C
    R = Hkv * G * Tq
    cols = Hkv * C
    # q rows (h, g, tq) with tq minor, matching the kernel's row order
    qg = (q.reshape(S, Tq, Hkv, G, D).transpose(0, 2, 3, 1, 4)
          .reshape(S, R, D).astype(jnp.bfloat16))
    # scales per chunk, columns (h, c) h-major — matches kx.reshape
    ksc = (ks.reshape(S, Hkv, nc, C).transpose(0, 2, 1, 3)
           .reshape(S, nc, 1, cols).astype(jnp.float32))
    vsc = (vs.reshape(S, Hkv, nc, C).transpose(0, 2, 1, 3)
           .reshape(S, nc, 1, cols).astype(jnp.float32))
    # visibility as additive bias, tiled over the Hkv column groups
    vb = jnp.where(visibility, 0.0, NEG_INF).astype(jnp.float32)
    vb = vb.reshape(S, Tq, nc, C).transpose(0, 2, 1, 3)  # [S, nc, Tq, C]
    vb = jnp.broadcast_to(vb[:, :, :, None, :], (S, nc, Tq, Hkv, C)
                          ).reshape(S, nc, Tq, cols)

    kernel = functools.partial(_kernel, n_chunks=nc, Hkv=Hkv, G=G, Tq=Tq,
                               C=C, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(S, nc),
        in_specs=[
            pl.BlockSpec((1, R, D), lambda s, c: (s, 0, 0)),
            pl.BlockSpec((1, Hkv, C, D), lambda s, c: (s, 0, c, 0)),
            pl.BlockSpec((1, 1, 1, cols), lambda s, c: (s, c, 0, 0)),
            pl.BlockSpec((1, Hkv, C, D), lambda s, c: (s, 0, c, 0)),
            pl.BlockSpec((1, 1, 1, cols), lambda s, c: (s, c, 0, 0)),
            pl.BlockSpec((1, 1, Tq, cols), lambda s, c: (s, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, D), lambda s, c: (s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, R, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),  # running max
            pltpu.VMEM((R, 128), jnp.float32),  # running sum
            pltpu.VMEM((R, D), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qg, kq, ksc, vq, vsc, vb)
    # [S, (h, g, tq), D] -> [S, Tq, H*D]
    out = out.reshape(S, Hkv, G, Tq, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(S, Tq, H * D)


@functools.partial(jax.jit,
                   static_argnames=("scale", "page_size", "interpret",
                                    "state"))
def flash_decode_paged(q: jax.Array, k_pool: jax.Array, ks_pool: jax.Array,
                       v_pool: jax.Array, vs_pool: jax.Array,
                       page_table: jax.Array, visibility: jax.Array,
                       scale: float, page_size: int,
                       interpret: bool = False, state: bool = False):
    """Flash-decode directly over the PAGED pool (kv/paged.py): the
    page table rides as a scalar-prefetch operand and each T-chunk's
    BlockSpec index_map dereferences it — chunk == page, so the kernel
    streams exactly the pages the slot owns WITHOUT materializing the
    gathered [S, Hkv, T_logical, D] view the XLA paged path builds
    (that gather re-writes the whole cache once per layer).

    q: [S, Tq, H, D]; k_pool/v_pool: [P, Hkv, page, D] int8;
    ks_pool/vs_pool: [P, Hkv, page] f32; page_table: [S, MP] int32
    (entries may be P = unallocated — clipped here, masked by
    visibility); visibility: [S, Tq, MP * page] bool.
    Returns [S, Tq, H*D] f32. Same kernel as flash_decode_quant.

    state=True: returns the UNNORMALIZED softmax partition
    (o [S, R, D], m [S, R], l [S, R]) with rows R = (h, g, tq)
    tq-minor — the deferred-KV path merges the in-flight block's
    partition in XLA before normalizing (forward() paged decode defers
    all pool scatters to one post-scan commit; per-layer scatters on
    loop-sliced pool slabs were the measured +33-44% S=8 overhead)."""
    S, Tq, H, D = q.shape
    P, Hkv, C = k_pool.shape[0], k_pool.shape[1], page_size
    MP = page_table.shape[1]
    G = H // Hkv
    nc = MP
    R = Hkv * G * Tq
    cols = Hkv * C
    qg = (q.reshape(S, Tq, Hkv, G, D).transpose(0, 2, 3, 1, 4)
          .reshape(S, R, D).astype(jnp.bfloat16))
    # pool scales in the kernel's flat (h, c) h-major column layout;
    # [P, 1, cols] so the same per-page index picks the right row
    ksc = ks_pool.reshape(P, 1, cols).astype(jnp.float32)
    vsc = vs_pool.reshape(P, 1, cols).astype(jnp.float32)
    # visibility bias in LOGICAL coordinates (chunk c == logical page c)
    vb = jnp.where(visibility, 0.0, NEG_INF).astype(jnp.float32)
    vb = vb.reshape(S, Tq, nc, C).transpose(0, 2, 1, 3)  # [S, nc, Tq, C]
    vb = jnp.broadcast_to(vb[:, :, :, None, :], (S, nc, Tq, Hkv, C)
                          ).reshape(S, nc, Tq, cols)
    pt = jnp.minimum(page_table, P - 1).astype(jnp.int32)

    if state:
        def kernel(pt_ref, q, k, ks, v, vs, vb, o, m_o, l_o,
                   m_sc, l_sc, acc):
            _kernel(q, k, ks, v, vs, vb, o, m_sc, l_sc, acc,
                    n_chunks=nc, Hkv=Hkv, G=G, Tq=Tq, C=C, scale=scale,
                    m_ref=m_o, l_ref=l_o)

        out_specs = [pl.BlockSpec((1, R, D), lambda s, c, pt: (s, 0, 0)),
                     pl.BlockSpec((1, R, 128), lambda s, c, pt: (s, 0, 0)),
                     pl.BlockSpec((1, R, 128), lambda s, c, pt: (s, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((S, R, D), jnp.float32),
                     jax.ShapeDtypeStruct((S, R, 128), jnp.float32),
                     jax.ShapeDtypeStruct((S, R, 128), jnp.float32)]
    else:
        def kernel(pt_ref, *args):
            # the prefetched page table feeds the index_maps only
            _kernel(*args, n_chunks=nc, Hkv=Hkv, G=G, Tq=Tq, C=C,
                    scale=scale)

        out_specs = pl.BlockSpec((1, R, D), lambda s, c, pt: (s, 0, 0))
        out_shape = jax.ShapeDtypeStruct((S, R, D), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S, nc),
            in_specs=[
                pl.BlockSpec((1, R, D), lambda s, c, pt: (s, 0, 0)),
                pl.BlockSpec((1, Hkv, C, D),
                             lambda s, c, pt: (pt[s, c], 0, 0, 0)),
                pl.BlockSpec((1, 1, cols), lambda s, c, pt: (pt[s, c], 0, 0)),
                pl.BlockSpec((1, Hkv, C, D),
                             lambda s, c, pt: (pt[s, c], 0, 0, 0)),
                pl.BlockSpec((1, 1, cols), lambda s, c, pt: (pt[s, c], 0, 0)),
                pl.BlockSpec((1, 1, Tq, cols), lambda s, c, pt: (s, c, 0, 0)),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.float32),
                pltpu.VMEM((R, 128), jnp.float32),
                pltpu.VMEM((R, D), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pt, qg, k_pool, ksc, v_pool, vsc, vb)
    if state:
        o, m, l = out
        return o, m[:, :, 0], l[:, :, 0]
    out = out.reshape(S, Hkv, G, Tq, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(S, Tq, H * D)


def flash_decode_paged_deferred(q: jax.Array, k_pool: jax.Array,
                                ks_pool: jax.Array, v_pool: jax.Array,
                                vs_pool: jax.Array, page_table: jax.Array,
                                vis_committed: jax.Array,
                                knew_q: jax.Array, knew_s: jax.Array,
                                vnew_q: jax.Array, vnew_s: jax.Array,
                                intra_vis: jax.Array, scale: float,
                                page_size: int,
                                interpret: bool = False) -> jax.Array:
    """Paged flash decode with a DEFERRED in-flight K/V block.

    The committed pages stream through the state-mode kernel
    (unnormalized o/m/l); this step's not-yet-committed K/V
    (knew_q/vnew_q [S, Hkv, Tq, D] int8 + scales [S, Hkv, Tq],
    intra_vis [S, Tq, Tq]) forms a second softmax partition computed
    in XLA (Tq-sized — tiny at decode), merged exactly like the
    sequence-parallel combiner (attention.py gqa_attention_quant_sp).
    Lets forward() defer every pool scatter to one post-scan commit.
    """
    S, Tq, H, D = q.shape
    Hkv = k_pool.shape[1]
    G = H // Hkv
    R = Hkv * G * Tq
    o1, m1, l1 = flash_decode_paged(q, k_pool, ks_pool, v_pool, vs_pool,
                                    page_table, vis_committed, scale,
                                    page_size, interpret=interpret,
                                    state=True)  # [S,R,D], [S,R], [S,R]
    dt = jnp.bfloat16
    qg = q.reshape(S, Tq, Hkv, G, D).astype(dt)
    sn = jnp.einsum("sqhgd,shkd->shgqk", qg, knew_q.astype(dt),
                    preferred_element_type=jnp.float32)
    sn = sn * (knew_s[:, :, None, None, :] * scale)
    sn = jnp.where(intra_vis[:, None, None, :, :], sn, NEG_INF)
    m2 = jnp.max(sn, axis=-1)  # [S, Hkv, G, Tq]
    p2 = jnp.exp(sn - m2[..., None])
    p2 = jnp.where(sn > NEG_INF / 2, p2, 0.0)
    l2 = jnp.sum(p2, axis=-1)
    o2 = jnp.einsum("shgqk,shkd->shgqd",
                    (p2 * vnew_s[:, :, None, None, :]).astype(dt),
                    vnew_q.astype(dt),
                    preferred_element_type=jnp.float32)
    # grouped [S, Hkv, G, Tq, ...] -> kernel row order R = (h, g, tq)
    m2r = m2.reshape(S, R)
    l2r = l2.reshape(S, R)
    o2r = o2.reshape(S, R, D)
    m = jnp.maximum(m1, m2r)
    a1 = jnp.where(m1 > NEG_INF / 2, jnp.exp(m1 - m), 0.0)
    a2 = jnp.where(m2r > NEG_INF / 2, jnp.exp(m2r - m), 0.0)
    l = l1 * a1 + l2r * a2
    o = o1 * a1[..., None] + o2r * a2[..., None]
    out = o / jnp.where(l > 0, l, 1.0)[..., None]
    out = out.reshape(S, Hkv, G, Tq, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(S, Tq, H * D)
