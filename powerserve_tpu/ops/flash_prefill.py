"""Pallas flash-prefill attention over the INT8 KV cache.

Prefill-shape attention (large Tq) reading the quantized cache
directly. The XLA paths materialize either the full [S,Hkv,G,Tq,T]
score tensor (dense, T<=1024) or per-chunk online-softmax carries in
HBM (lax.scan: the [S,Hkv,G,Tq,D] f32 accumulator is written+read
every chunk); this kernel keeps the whole running-softmax state in
VMEM, so HBM traffic is just Q once + K/V once + output once.

Visibility is computed IN-KERNEL instead of shipping a [S,Tq,T] bias
(whose HBM traffic would dwarf the int8 K/V itself): the kernel covers
exactly the standard prefill pattern —

  vis[s, q, t] = cache_mask[s, t]                 (committed tokens)
               | (0 <= t - start_s <= q)          (contiguous new batch,
                                                   causal, pad at end)

where start_s is the slot's write offset (cache_positions[s, 0]).
Padded -1 lanes sit at the END of every caller's chunk, so their query
rows are garbage that nothing reads, and the cache entries they would
"see" are only visible to garbage rows. Tree/eagle verification
(intra_mask / vis_override) stays on the XLA paths.

Grid (S, Hkv, q-block, kv-chunk): per instance a [G*Qb, D] query block
against a [C, D] K/V chunk with scale folding (same math as
ops/attention.py::gqa_attention_quant, the golden reference in tests).
kv-chunk is the innermost "arbitrary" dim accumulating into VMEM
scratch (flash_decode.py's pattern at decode shapes).

MEASURED on v5e (r2s4, marginal-cost .bench_fprefill.py): this kernel
LOSES to the XLA prefill path at nearly every shape (S=1 T=1024
Tq=512: 173 vs 65 us; T=8192: 1134 vs 666) and wins only the batched
small-Tq bucket S=8/Tq=128 (308 vs 392) — XLA's prefill attention is
already MXU-efficient at large Tq. Routing: gqa_attention_quant
backend="auto" auto-routes EXACTLY that winning bucket (S >= 8,
17 <= Tq <= 128, dense int8 cache) here; everything else stays XLA.
POWERSERVE_FLASH_PREFILL=1 forces the kernel for re-benchmarks.

Replaces the role of the reference's CPU attention subgraph
(norm_attention.cpp:26-162) at prefill shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(start_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, mask_ref,
            o_ref, m_sc, l_sc, acc, *, n_chunks: int, G: int, Qb: int,
            C: int, T_real: int, scale: float):
    s = pl.program_id(0)
    qb = pl.program_id(2)
    c = pl.program_id(3)

    @pl.when(c == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, NEG_INF)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc[...] = jnp.zeros_like(acc)

    R = G * Qb
    qx = q_ref[0, 0, 0]  # [R, D] bf16, rows (g, qb) g-major
    kx = k_ref[0, 0]  # [C, D] int8
    ksx = ks_ref[0, 0, 0]  # [1, C] f32
    vsx = vs_ref[0, 0, 0]
    mrow = mask_ref[0, 0]  # [1, C] int32 committed-visibility (Mosaic
    # rejects unsigned-i8 vector compares — "Target does not support
    # this comparison" — so the host ships int32)

    s_c = jax.lax.dot_general(
        qx, kx.astype(qx.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [R, C]
    s_c = s_c * (ksx * scale)

    # in-kernel visibility: committed mask | contiguous-causal new batch
    start = start_ref[s]
    t_glob = c * C + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    q_glob = (qb * Qb
              + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) % Qb)
    off = t_glob - start
    vis = (jnp.broadcast_to(mrow > 0, (R, C))
           | ((off >= 0) & (off <= q_glob))) & (t_glob < T_real)
    s_c = jnp.where(vis, s_c, NEG_INF)

    m_prev = m_sc[...][:, :1]  # state stored [R, 128]; col 0 is live
    m_cur = jnp.max(s_c, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s_c - m_new)
    l_new = l_sc[...][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pf = (p * vsx).astype(qx.dtype)
    pv = jnp.dot(pf, v_ref[0, 0].astype(qx.dtype),
                 preferred_element_type=jnp.float32)  # [R, D]
    acc[...] = acc[...] * alpha + pv
    m_sc[...] = jnp.broadcast_to(m_new, m_sc.shape)
    l_sc[...] = jnp.broadcast_to(l_new, l_sc.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        l = l_sc[...][:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0, 0] = (acc[...] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "qb", "chunk", "interpret"))
def flash_prefill_quant(q: jax.Array, kq: jax.Array, ks: jax.Array,
                        vq: jax.Array, vs: jax.Array,
                        cache_mask: jax.Array, start: jax.Array,
                        scale: float, qb: int = 128, chunk: int = 512,
                        interpret: bool = False) -> jax.Array:
    """q: [S, Tq, H, D]; kq/vq: [S, Hkv, T, D] int8; ks/vs: [S, Hkv, T];
    cache_mask: [S, T] bool (committed tokens, BEFORE advance);
    start: [S] int32 — the batch's contiguous write offset per slot
    (cache_positions[:, 0]; -1 / garbage for inactive slots is fine,
    their outputs are never read). Returns [S, Tq, H*D] f32.
    """
    S, Tq, H, D = q.shape
    Hkv, T = kq.shape[1], kq.shape[2]
    G = H // Hkv
    T_real = T
    Qb = min(qb, Tq)
    if Tq % Qb:
        qpad = Qb - Tq % Qb
        q = jnp.pad(q, ((0, 0), (0, qpad), (0, 0), (0, 0)))
    Tqp = q.shape[1]
    nq = Tqp // Qb
    C = min(chunk, T)
    if T % C:
        pad = C - T % C
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad)))
        cache_mask = jnp.pad(cache_mask, ((0, 0), (0, pad)))
        T = T + pad
    nc = T // C
    R = G * Qb
    # rows (g, qb) g-major per (slot, head, q-block)
    qg = (q.reshape(S, nq, Qb, Hkv, G, D).transpose(0, 3, 1, 4, 2, 5)
          .reshape(S, Hkv, nq, R, D).astype(jnp.bfloat16))
    ksc = ks.reshape(S, Hkv, nc, 1, C).astype(jnp.float32)
    vsc = vs.reshape(S, Hkv, nc, 1, C).astype(jnp.float32)
    maskc = cache_mask.reshape(S, nc, 1, C).astype(jnp.int32)

    kernel = functools.partial(_kernel, n_chunks=nc, G=G, Qb=Qb, C=C,
                               T_real=T_real, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, Hkv, nq, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 1, R, D), lambda s, h, b, c, st: (s, h, b, 0, 0)),
            pl.BlockSpec((1, 1, C, D), lambda s, h, b, c, st: (s, h, c, 0)),
            pl.BlockSpec((1, 1, 1, 1, C), lambda s, h, b, c, st: (s, h, c, 0, 0)),
            pl.BlockSpec((1, 1, C, D), lambda s, h, b, c, st: (s, h, c, 0)),
            pl.BlockSpec((1, 1, 1, 1, C), lambda s, h, b, c, st: (s, h, c, 0, 0)),
            pl.BlockSpec((1, 1, 1, C), lambda s, h, b, c, st: (s, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, R, D),
                               lambda s, h, b, c, st: (s, h, b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),  # running max
            pltpu.VMEM((R, 128), jnp.float32),  # running sum
            pltpu.VMEM((R, D), jnp.float32),  # output accumulator
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, Hkv, nq, R, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(start.astype(jnp.int32), qg, kq, ksc, vq, vsc, maskc)
    # [S, Hkv, nq, (g, qb), D] -> [S, Tq, H*D]
    out = (out.reshape(S, Hkv, nq, G, Qb, D).transpose(0, 2, 4, 1, 3, 5)
           .reshape(S, Tqp, H * D))
    return out[:, :Tq]
