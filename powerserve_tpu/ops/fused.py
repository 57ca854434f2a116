"""Fused decode-chain quantized matmuls (Pallas).

At decode shapes (M <= 16) every projection in the per-token serial
chain is latency-bound, not FLOP-bound: the ~1.5-1.7 ms/draft residual
in the EAGLE/self-draft head forward is a sum of ~10 kernel-launch
latencies (.bench_eagle_ablate.py), and the main decode layer carries
the same glue (norm -> matmul -> silu -> matmul -> residual) as
separate XLA fusions BETWEEN Pallas calls — XLA cannot fuse across an
opaque custom call. This module moves the glue INTO the matmul kernel:

  prologue: rms-norm over the residual stream (optionally adding the
            attention branch first), silu-GLU activation of a fused
            gate|up block, two-part input concat (the EAGLE fc input
            [embedding; feature])
  epilogue: bias add, residual adds, greedy argmax (per-call best
            token instead of a [M, vocab] logits write + argmax pass)

One fused call == one Pallas launch. At M = 1 a llama layer + head is
  norm+QKV | rope/attn (XLA) | wo | norm+gate-up | silu+down+residual
  | norm+lm_head(+argmax)
= 5 Pallas launches with no elementwise XLA kernels between them.

Kernel form: grid (n_tiles,) with ONE full-K tile per call — the
proven decode fat-tile regime of ops/qmatmul.py (K <= 16384 covers
every 8B projection, bm <= 16). Nibble unpack is the per-pack-group
static-slice float chain with f32 scale planes and f32 dots
(qmatmul's measured decode-M winner); the Q4_K per-block min is a
per-element fma here (the bsum blocksum trick needs a precomputed
blocksum of the PROLOGUE OUTPUT, which by construction never
materializes — measured cost of the fma ~4-6 us/matmul vs one launch
saved).

Reference role: the NPU path executes a whole transformer chunk as one
graphExecute (reference src/backend/qnn/causal_models.cpp:298-330);
collapsing the per-token chain into a handful of launches is the TPU
equivalent of that single-launch spirit.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quant import QK
from .elementwise import rms_norm, silu_hadamard
from .qmatmul import QLinear, _is_tpu, _pick_bn, _select_knobs, qmatmul

__all__ = ["fused_linear", "fusable"]

# master gate: POWERSERVE_FUSED=0 restores the unfused composition
# everywhere (fallback path below == the pre-fusion op sequence)
_FUSED_DEFAULT = os.environ.get("POWERSERVE_FUSED", "1") != "0"
# in-kernel blocksum dequant (mul-only zero-point fold): 0 restores the
# per-element fma (A/B gate)
_FUSED_BSUM = os.environ.get("POWERSERVE_FUSED_BSUM", "1") != "0"

_NEG_INF = float("-inf")
_BIG_IDX = 2 ** 30  # python literal: jnp scalars would be captured consts


def fusable(lin: QLinear, m: int) -> bool:
    """Can this (lin, M) run the single-K-tile fused kernel?"""
    if not _FUSED_DEFAULT or m > 16:
        return False
    if lin.scale_group != QK:  # W8 MXU format: different kernel family
        return False
    k, n = lin.in_features, lin.out_features
    if n % 128 != 0:
        return False
    if _pick_bn(n, _select_knobs(m, k, n)[0]) is None:
        return False
    if lin.packed:
        g = lin.pack_group
        return g % 64 == 0 and k % g == 0 and k <= 16384
    return k % QK == 0 and k <= 8192


@dataclass(frozen=True)
class _Spec:
    pro: str  # "x" | "norm" | "glu" | "concat2"
    n_pro: int  # number of [M, *] prologue operands (before norm w)
    eps: float
    packed: bool
    unsigned: bool
    n_groups: int
    group: int
    k: int
    has_wmin: bool  # Q4_K per-block additive min
    has_bias: bool
    n_resid: int
    argmax: bool
    n_tiles: int
    prefetch: bool
    stacked_nw: bool
    stacked_bias: bool
    # mul-only dequant: fold the per-block zero point through an
    # IN-KERNEL blocksum of the prologue output (bs = x @ 0/1 block
    # matrix on the MXU, then a tiny [bm, kb] x [kb, bn] correction
    # dot) instead of the per-element fma — recovers the bsum-kernel
    # dequant efficiency the fused path used to give up
    bsum: bool = False


def _make_fused_kernel(s: _Spec):
    def kernel(*refs):
        if s.prefetch:
            refs = refs[1:]
        refs = list(refs)
        pro_refs = [refs.pop(0) for _ in range(s.n_pro)]
        nw_ref = refs.pop(0) if s.pro == "norm" else None
        q_ref = refs.pop(0)
        s_ref = refs.pop(0)
        b_ref = refs.pop(0) if s.has_wmin else None
        bias_ref = refs.pop(0) if s.has_bias else None
        r_refs = [refs.pop(0) for _ in range(s.n_resid)]
        if s.argmax:
            ob_ref, oi_ref = refs.pop(0), refs.pop(0)
            best, bidx, *scratch = refs
        else:
            o_ref = refs.pop(0)
            scratch = refs
        if s.prefetch:  # stacked weights carry a leading layer dim of 1
            q_ref = q_ref.at[0]
            s_ref = s_ref.at[0]
            if b_ref is not None:
                b_ref = b_ref.at[0]
            if nw_ref is not None and s.stacked_nw:
                nw_ref = nw_ref.at[0]
            if bias_ref is not None and s.stacked_bias:
                bias_ref = bias_ref.at[0]

        # ---- prologue: the f32 activation row [bm, K] ----------------
        # glu computes its silu(g)*u activation lazily PER K-SLICE
        # inside the dot loop below (a full-width [bm, 2*14336] build
        # plus temporaries fails the Mosaic compile at the 8B down-proj
        # width; per-group slices keep live ranges one group wide)
        if s.pro == "norm":
            a = pro_refs[0][...].astype(jnp.float32)
            for r in pro_refs[1:]:
                a = a + r[...].astype(jnp.float32)
            var = jnp.mean(a * a, axis=-1, keepdims=True)
            xn = a * jax.lax.rsqrt(var + s.eps) \
                * nw_ref[...].astype(jnp.float32)
            x = xn.astype(jnp.bfloat16).astype(jnp.float32)
        elif s.pro == "glu":
            x = None
        elif s.pro == "concat2":
            parts = [r[...].astype(jnp.bfloat16).astype(jnp.float32)
                     for r in pro_refs]
            x = jnp.concatenate(parts, axis=1)
        else:  # "x"
            x = pro_refs[0][...].astype(jnp.bfloat16).astype(jnp.float32)

        def xs(lo, width):
            """x rows for k range [lo, lo+width)."""
            if s.pro == "glu":
                g = pro_refs[0][:, lo : lo + width].astype(jnp.float32)
                u = pro_refs[0][:, s.k + lo : s.k + lo + width].astype(
                    jnp.float32)
                act = g * (1.0 / (1.0 + jnp.exp(-g))) * u
                return act.astype(jnp.bfloat16).astype(jnp.float32)
            return x[:, lo : lo + width]

        # ---- single full-K tile dequant + dots -----------------------
        acc = None
        if s.packed:
            half = s.group // 2
            kbh = half // QK
            if s.bsum:
                # 0/1 block-membership matrix (shared by all groups):
                # x_half @ sel = per-32-block sums of the activation
                sel = (jax.lax.broadcasted_iota(
                    jnp.int32, (half, kbh), 0) // QK
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (half, kbh), 1)).astype(jnp.float32)
            for g in range(s.n_groups):
                part = q_ref[g * half : (g + 1) * half, :]
                qf = part.astype(jnp.int32).astype(jnp.float32)
                hi = jnp.floor(qf * (1.0 / 16.0))
                lo = qf - hi * 16.0
                s0 = g * 2 * kbh
                s_lo = jnp.repeat(
                    s_ref[s0 : s0 + kbh, :].astype(jnp.float32), QK, axis=0)
                s_hi = jnp.repeat(
                    s_ref[s0 + kbh : s0 + 2 * kbh, :].astype(jnp.float32),
                    QK, axis=0)
                x_lo = xs(g * s.group, half)
                x_hi = xs(g * s.group + half, half)
                if s.bsum:
                    # mul-only planes; the zero point rides a tiny
                    # correction dot on the blocksums
                    w_lo = lo * s_lo
                    w_hi = hi * s_hi
                    bs_lo = jnp.dot(x_lo, sel,
                                    preferred_element_type=jnp.float32)
                    bs_hi = jnp.dot(x_hi, sel,
                                    preferred_element_type=jnp.float32)
                    if s.unsigned:
                        off_lo = b_ref[s0 : s0 + kbh, :].astype(
                            jnp.float32)
                        off_hi = b_ref[s0 + kbh : s0 + 2 * kbh, :].astype(
                            jnp.float32)
                    else:  # biased (+8) nibbles: offset = 8 * scale
                        off_lo = s_ref[s0 : s0 + kbh, :].astype(
                            jnp.float32) * 8.0
                        off_hi = s_ref[s0 + kbh : s0 + 2 * kbh, :].astype(
                            jnp.float32) * 8.0
                    corr = jnp.dot(bs_lo, off_lo,
                                   preferred_element_type=jnp.float32) \
                        + jnp.dot(bs_hi, off_hi,
                                  preferred_element_type=jnp.float32)
                elif s.unsigned:
                    b_lo = jnp.repeat(
                        b_ref[s0 : s0 + kbh, :].astype(jnp.float32),
                        QK, axis=0)
                    b_hi = jnp.repeat(
                        b_ref[s0 + kbh : s0 + 2 * kbh, :].astype(
                            jnp.float32), QK, axis=0)
                    w_lo = lo * s_lo - b_lo
                    w_hi = hi * s_hi - b_hi
                else:  # nibbles stored biased (+8)
                    w_lo = (lo - 8.0) * s_lo
                    w_hi = (hi - 8.0) * s_hi
                p = jnp.dot(x_lo, w_lo,
                            preferred_element_type=jnp.float32) \
                    + jnp.dot(x_hi, w_hi,
                              preferred_element_type=jnp.float32)
                if s.bsum:
                    p = p - corr
                acc = p if acc is None else acc + p
        else:
            w = q_ref[...].astype(jnp.float32) \
                * jnp.repeat(s_ref[...].astype(jnp.float32), QK, axis=0)
            if b_ref is not None:
                w = w - jnp.repeat(b_ref[...].astype(jnp.float32), QK,
                                   axis=0)
            acc = jnp.dot(xs(0, s.k if s.pro == "glu" else w.shape[0]),
                          w, preferred_element_type=jnp.float32)

        # ---- epilogue ------------------------------------------------
        if bias_ref is not None:
            acc = acc + bias_ref[...].astype(jnp.float32)
        if r_refs:
            # resid-first association: (r0 + r1) + acc — matches the
            # unfused "(x + attn_out) + down" order exactly, so the
            # tp path (psum between matmul and residual) stays
            # bit-identical to the single-device fused path
            rs = r_refs[0][...].astype(jnp.float32)
            for r in r_refs[1:]:
                rs = rs + r[...].astype(jnp.float32)
            acc = rs + acc

        if not s.argmax:
            o_ref[...] = acc
            return

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            best[...] = jnp.full_like(best, _NEG_INF)
            bidx[...] = jnp.zeros_like(bidx)

        bm = acc.shape[0]
        bn = acc.shape[1]
        tm = jnp.max(acc, axis=1, keepdims=True)  # [bm, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1) + j * bn
        ti = jnp.min(jnp.where(acc >= tm, iota, _BIG_IDX), axis=1,
                     keepdims=True)
        tmb = jnp.broadcast_to(tm, (bm, 128))
        tib = jnp.broadcast_to(ti, (bm, 128))
        upd = tmb > best[...]
        best[...] = jnp.where(upd, tmb, best[...])
        bidx[...] = jnp.where(upd, tib, bidx[...])

        @pl.when(j == s.n_tiles - 1)
        def _():
            ob_ref[...] = best[...]
            oi_ref[...] = bidx[...]

    return kernel


def _as2d(a):
    return a if a.ndim >= 2 else a.reshape(1, -1)


def _round_up(x: int, mult: int) -> int:
    return (x + mult - 1) // mult * mult


def _fused_pallas(lin: QLinear, pro: str, pro_ops, nw, bias, resids,
                  argmax: bool, layer, eps: float, interpret: bool):
    m0 = m = pro_ops[0].shape[0]
    k, n = lin.in_features, lin.out_features
    # block sublane dims must be 8-divisible OR equal the array dim —
    # and blocks must cover the array EXACTLY: partial edge blocks
    # (bm=8 over an m=1 array) DMA past the buffer and fault the chip
    # in larger programs (nondeterministic by HBM allocation; the
    # window decode scan reproduced it)
    bm = m if m <= 8 else _round_up(m, 8)
    if bm != m:
        pad = bm - m
        pro_ops = [jnp.pad(p, ((0, pad), (0, 0))) for p in pro_ops]
        resids = [jnp.pad(r, ((0, pad), (0, 0))) for r in resids]
        m = bm
    bn = _pick_bn(n, _select_knobs(m, k, n)[0])
    n_tiles = n // bn
    stacked = lin.q.ndim == 3
    prefetch = stacked
    assert not stacked or layer is not None
    group = lin.pack_group if lin.packed else 0
    n_groups = (k // group) if lin.packed else 1
    qrows = k // 2 if lin.packed else k
    nb = k // QK
    glu_k = k if pro == "glu" else 0

    nw2 = None if nw is None else _as2d(nw)
    bias2 = None if bias is None else _as2d(bias)
    spec = _Spec(
        pro=pro, n_pro=len(pro_ops), eps=eps, packed=lin.packed,
        unsigned=lin.unsigned, n_groups=n_groups, group=group,
        k=glu_k or k, has_wmin=lin.bias is not None,
        has_bias=bias is not None, n_resid=len(resids), argmax=argmax,
        n_tiles=n_tiles, prefetch=prefetch,
        stacked_nw=nw2 is not None and nw2.ndim == 2 and stacked
        and nw2.shape[0] != 1,
        stacked_bias=bias2 is not None and bias2.ndim == 2 and stacked
        and bias2.shape[0] != 1,
        bsum=lin.packed and _FUSED_BSUM,
    )

    in_specs, inputs = [], []

    def add(arr, blk, idx_map):
        in_specs.append(pl.BlockSpec(blk, idx_map))
        inputs.append(arr)

    def row_spec(arr):  # [M, K*] full-row operand
        if prefetch:
            add(arr, (bm, arr.shape[1]), lambda j, L: (0, 0))
        else:
            add(arr, (bm, arr.shape[1]), lambda j: (0, 0))

    for op in pro_ops:
        row_spec(op)
    if pro == "norm":
        w2 = nw2
        if spec.stacked_nw:
            # stacked [L, K] -> [L, 1, K]: Mosaic wants the sublane dim
            # of a block to be 8-divisible or equal the array dim
            add(w2.reshape(-1, 1, k), (1, 1, k),
                lambda j, L: (L[0], 0, 0))
        elif prefetch:
            add(w2, (1, k), lambda j, L: (0, 0))
        else:
            add(w2, (1, k), lambda j: (0, 0))
    if prefetch:
        add(lin.q, (1, qrows, bn), lambda j, L: (L[0], 0, j))
        add(lin.scales, (1, nb, bn), lambda j, L: (L[0], 0, j))
        if lin.bias is not None:
            add(lin.bias, (1, nb, bn), lambda j, L: (L[0], 0, j))
    else:
        add(lin.q, (qrows, bn), lambda j: (0, j))
        add(lin.scales, (nb, bn), lambda j: (0, j))
        if lin.bias is not None:
            add(lin.bias, (nb, bn), lambda j: (0, j))
    if bias2 is not None:
        if spec.stacked_bias:
            add(bias2.reshape(bias2.shape[0], 1, -1), (1, 1, bn),
                lambda j, L: (L[0], 0, j))
        elif prefetch:
            add(bias2, (1, bn), lambda j, L: (0, j))
        else:
            add(bias2, (1, bn), lambda j: (0, j))
    for r in resids:
        if prefetch:
            add(r, (bm, bn), lambda j, L: (0, j))
        else:
            add(r, (bm, bn), lambda j: (0, j))

    if argmax:
        out_shape = (jax.ShapeDtypeStruct((m, 128), jnp.float32),
                     jax.ShapeDtypeStruct((m, 128), jnp.int32))
        if prefetch:
            out_specs = (pl.BlockSpec((bm, 128), lambda j, L: (0, 0)),
                         pl.BlockSpec((bm, 128), lambda j, L: (0, 0)))
        else:
            out_specs = (pl.BlockSpec((bm, 128), lambda j: (0, 0)),
                         pl.BlockSpec((bm, 128), lambda j: (0, 0)))
        scratch = [pltpu.VMEM((bm, 128), jnp.float32),
                   pltpu.VMEM((bm, 128), jnp.int32)]
    else:
        out_shape = jax.ShapeDtypeStruct((m, n), jnp.float32)
        if prefetch:
            out_specs = pl.BlockSpec((bm, bn), lambda j, L: (0, j))
        else:
            out_specs = pl.BlockSpec((bm, bn), lambda j: (0, j))
        scratch = []

    kernel = _make_fused_kernel(spec)
    q_bytes = lin.q.size * lin.q.dtype.itemsize // (lin.q.shape[0]
                                                    if stacked else 1)
    x_bytes = sum(op.size * op.dtype.itemsize for op in pro_ops)
    cost = pl.CostEstimate(flops=2 * m * n * k,
                           bytes_accessed=q_bytes + x_bytes + 4 * m * n,
                           transcendentals=m * k if pro == "glu" else 0)
    common = dict(
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the glu down-proj (gu f32 [bm, 2*14336] + full-K weight
            # tile + full-K scales/mins) sits 244K over the default
            # 16M scoped-vmem budget; v5e has 128M physical
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=cost,
        interpret=interpret,
    )
    if prefetch:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_tiles,),
                in_specs=in_specs, out_specs=out_specs,
                scratch_shapes=scratch),
            **common,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *inputs)
    else:
        out = pl.pallas_call(kernel, grid=(n_tiles,), in_specs=in_specs,
                             out_specs=out_specs, scratch_shapes=scratch,
                             **common)(*inputs)
    if argmax:
        return out[1][:m0, 0]
    return out if m0 == m else out[:m0]


def _fallback(lin, pro, pro_ops, nw, bias, resids, argmax, layer, eps,
              backend):
    """The exact pre-fusion op sequence (CPU / GSPMD / ineligible
    shapes): prologue in XLA, qmatmul, epilogue in XLA."""
    if pro == "norm":
        a = pro_ops[0].astype(jnp.float32)
        for r in pro_ops[1:]:
            a = a + r.astype(jnp.float32)
        w = nw
        if w.ndim == 2:
            if w.shape[0] != 1 and layer is not None:
                w = jnp.take(w, layer, axis=0)
            else:
                w = w.reshape(-1)
        x = rms_norm(a, w, eps).astype(jnp.bfloat16)
    elif pro == "glu":
        gu = pro_ops[0]
        f = gu.shape[-1] // 2
        x = silu_hadamard(gu[:, :f], gu[:, f:]).astype(jnp.bfloat16)
    elif pro == "concat2":
        x = jnp.concatenate([p.astype(jnp.bfloat16) for p in pro_ops],
                            axis=1)
    else:
        x = pro_ops[0].astype(jnp.bfloat16)
    y = qmatmul(x, lin, backend=backend, layer=layer)
    if bias is not None:
        b = bias
        if b.ndim == 2 and b.shape[0] != 1 and layer is not None:
            b = jnp.take(b, layer, axis=0)
        y = y + b.reshape(1, -1).astype(jnp.float32)
    if resids:
        rs = resids[0].astype(jnp.float32)
        for r in resids[1:]:
            rs = rs + r.astype(jnp.float32)
        y = rs + y
    if argmax:
        return jnp.argmax(y, axis=-1).astype(jnp.int32)
    return y


def fused_linear(lin: QLinear, *, x=None, parts=None, norm=None, glu=None,
                 bias=None, resids=(), argmax=False, layer=None,
                 backend: str = "auto", eps: float = 1e-5):
    """One fused (prologue -> quantized matmul -> epilogue) launch.

    Exactly one of x / parts / norm / glu selects the prologue:
      x:     [M, K] activation (cast to bf16, the plain qmatmul input)
      parts: tuple of [M, Ki] concatenated along K (EAGLE fc input)
      norm:  (resid[, branch...], norm_weight) — rms_norm(sum(resids),
             w) computed in-kernel; norm_weight may be stacked [L, K]
             (picked by `layer` via scalar prefetch)
      glu:   [M, 2K] fused gate|up block -> silu(g) * u in-kernel

    bias: [N] (or stacked [L, N]) added to the output.
    resids: [M, N] arrays added to the output (residual stream).
    argmax=True: returns int32 [M] greedy tokens instead of logits —
      the [M, N] logits never leave VMEM (per-tile running max/argmax
      in scratch; first-occurrence tie-breaking matches jnp.argmax).
    layer: scalar-prefetch slab index for stacked [L, ...] weights.

    Falls back to the identical unfused op sequence off-TPU or for
    ineligible shapes; numerics match the Pallas path to f32 rounding
    (dot/summation order differs from the bsum decode kernel).
    """
    n_sel = sum(v is not None for v in (x, parts, norm, glu))
    assert n_sel == 1, "exactly one of x/parts/norm/glu"
    nw = None
    if norm is not None:
        *pro_ops, nw = norm
        pro = "norm"
    elif glu is not None:
        pro_ops, pro = [glu], "glu"
    elif parts is not None:
        pro_ops, pro = list(parts), "concat2"
    else:
        pro_ops, pro = [x], "x"
    pro_ops = [_as2d(p) for p in pro_ops]
    m = pro_ops[0].shape[0]

    if backend == "auto":
        backend = "pallas" if _is_tpu() else "xla"
    interpret = backend == "pallas_interpret"
    if backend in ("pallas", "pallas_interpret") and fusable(lin, m):
        try:
            return _fused_pallas(lin, pro, pro_ops, nw, bias,
                                 list(resids), argmax, layer, eps,
                                 interpret)
        except Exception:
            if interpret:
                raise
            # Mosaic rejection at trace time: compose instead
            return _fallback(lin, pro, pro_ops, nw, bias, list(resids),
                             argmax, layer, eps, backend)
    return _fallback(lin, pro, pro_ops, nw, bias, list(resids), argmax,
                     layer, eps, backend if backend != "pallas_interpret"
                     else "xla")


def fused_enabled() -> bool:
    return _FUSED_DEFAULT
