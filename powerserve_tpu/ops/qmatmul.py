"""Quantized matmul: GGUF-family weights kept quantized in HBM, dequant
fused into the matmul (TPU replacement for the reference's ggml CPU
kernels and QNN int4 graphs — reference libs/ggml/src/ggml.c
powerserve_compute_forward_mul_mat and tools/qnn_converter int4 recipe).

Weight layout (see core/quant.py): contraction dim K on sublanes, output
dim N on lanes.

  y[m, n] = sum_k x[m, k] * (q[k, n] * scales[k//32, n] - bias[k//32, n])

Two storage forms:
  - unpacked: q int8 [K, N]            (1 byte / weight in HBM)
  - packed:   q uint8 [K//2, N]        (0.5 byte / weight), nibbles
              grouped per `pack_group` rows so a K-tile of one group
              unpacks with a single concat (core/quant.py:pack_nib4)

The Pallas kernel K-tiles at pack-group granularity with an f32 VMEM
accumulator (grid (m, n, k), k innermost/arbitrary), so VMEM stays flat
for any K (the 8B ffn down-proj K=14336 was the sizing case).

Backends:
  - "xla":    jnp dequant + matmul; XLA fuses. Baseline + CPU tests.
  - "pallas": the fused kernel.
  - "auto":   pallas on TPU (when shapes allow), else xla.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quant import QK, QuantizedTensor, choose_pack_group, pack_nib4

# nibble-unpack convert chain: 0 = u8 -> i32 -> f32 (two VPU passes,
# always Mosaic-safe), 1 = direct u8 -> f32 (.bench_unpack.py A/B:
# Mosaic REJECTS the direct cast — dead end, r4)
_UNPACK_DIRECT = 0
# bsum-kernel f32-dot override (.bench_unpack.py A/B): 0 = auto
# (f32 dots at decode-sized bm <= 16, bf16 dots otherwise — default),
# 1 = force f32 dots at every M, -1 = force bf16 dots everywhere.
# bf16 scale arithmetic was probed too: 105 us vs 71.6/75.9 (worse).
_BSUM_VARIANT = 0


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scales", "bias"],
    meta_fields=["packed", "unsigned", "in_features", "out_features",
                 "pack_group", "scale_group"],
)
@dataclass
class QLinear:
    """Quantized linear layer parameters (a jax pytree)."""

    q: jax.Array  # int8 [K, N] or uint8 [K//2, N] when packed
    scales: jax.Array  # f32/bf16 [K//scale_group, N]
    bias: jax.Array | None  # [K//32, N] (Q4_K additive min) or None
    packed: bool
    unsigned: bool  # True: nibbles are 0..15 (Q4_K); False: signed
    in_features: int
    out_features: int
    pack_group: int = 0  # nibble grouping (0 when not packed)
    # scale granularity along K: 32 = GGUF block scales (dequant-to-float
    # kernel); 128 = MXU-native W8 format (int8 MXU dots, scales applied
    # to depth-128 partial sums — see from_quantized(mxu=True))
    scale_group: int = QK

    @classmethod
    def from_quantized(cls, qt: QuantizedTensor, pack: bool = True,
                       scale_dtype: Any = jnp.float32,
                       mxu: bool = False) -> "QLinear":
        """Build device arrays from a repacked numpy QuantizedTensor.

        mxu=True: requantize to the MXU-native W8 format — symmetric
        int8 with per-128 scales (core/quant.py:requantize_w8); the
        Pallas path then runs int8 MXU dots instead of per-element
        dequant (the reference's int-arithmetic NPU recipe,
        tools/qnn_converter/export_to_onnx.py:629-690).
        """
        from ..core.gguf import GGMLType
        from ..core.quant import MXU_GROUP, requantize_w8

        if mxu and qt.k % MXU_GROUP == 0:
            q8, scales = requantize_w8(qt)
            return cls(jnp.asarray(q8), jnp.asarray(scales), None,
                       packed=False, unsigned=False, in_features=qt.k,
                       out_features=qt.n, pack_group=0,
                       scale_group=MXU_GROUP)
        is4bit = qt.ggml_type in (GGMLType.Q4_0, GGMLType.Q4_K)
        packed = bool(pack and is4bit and qt.k % 128 == 0)
        unsigned = qt.ggml_type == GGMLType.Q4_K
        group = 0
        if packed:
            group = choose_pack_group(qt.k)
            qdev = jnp.asarray(pack_nib4(qt.q, group,
                                         signed_bias=not unsigned))
        else:
            qdev = jnp.asarray(qt.q)
        scales = jnp.asarray(qt.scales.astype(np.float32), dtype=scale_dtype)
        bias = None
        if qt.bias is not None:
            bias = jnp.asarray(qt.bias.astype(np.float32), dtype=scale_dtype)
        return cls(qdev, scales, bias, packed, unsigned, qt.k, qt.n, group)

    @classmethod
    def from_float(cls, w: np.ndarray, ggml_type: int | None = None,
                   pack: bool = True) -> "QLinear":
        """Quantize a float [K, N] weight (testing / HF import)."""
        from ..core.gguf import GGMLType
        from ..core.quant import quantize, repack_gguf_tensor

        ggml_type = GGMLType.Q8_0 if ggml_type is None else ggml_type
        payload = quantize(np.ascontiguousarray(w.T), ggml_type)
        qt = repack_gguf_tensor(payload, ggml_type, (w.shape[1], w.shape[0]))
        return cls.from_quantized(qt, pack=pack)

    def nbytes(self) -> int:
        n = self.q.size * self.q.dtype.itemsize
        n += self.scales.size * self.scales.dtype.itemsize
        if self.bias is not None:
            n += self.bias.size * self.bias.dtype.itemsize
        return n


def _dequant_full(lin: QLinear, dtype: Any) -> jax.Array:
    if lin.packed:
        kh, n = lin.q.shape[-2:]
        half = lin.pack_group // 2
        lead = lin.q.shape[:-2]
        pg = lin.q.reshape(*lead, kh // half, half, n)
        lo = (pg & 0xF).astype(jnp.int8)
        hi = (pg >> 4).astype(jnp.int8)
        q = jnp.concatenate([lo, hi], axis=-2).reshape(*lead, kh * 2, n)
        if not lin.unsigned:
            q = (q - 8).astype(jnp.int8)  # nibbles stored biased (+8)
    else:
        q = lin.q
    w = q.astype(dtype) * jnp.repeat(lin.scales.astype(dtype),
                                     lin.scale_group, axis=-2)
    if lin.bias is not None:
        w = w - jnp.repeat(lin.bias.astype(dtype), QK, axis=-2)
    return w


def _qmatmul_xla(x: jax.Array, lin: QLinear, compute_dtype: Any) -> jax.Array:
    w = _dequant_full(lin, compute_dtype)
    return jnp.dot(x.astype(compute_dtype), w,
                   preferred_element_type=jnp.float32)


def _qmatmul_xla_grouped(x: jax.Array, lin: QLinear, tile_ids: jax.Array,
                         block_m: int, compute_dtype: Any) -> jax.Array:
    """Grouped fallback: scan over M tiles, dequant one slab per tile."""
    t = x.shape[0] // block_m
    xt = x.reshape(t, block_m, x.shape[1])

    def step(_, args):
        xi, gid = args
        return None, _qmatmul_xla(xi, _slice_layer(lin, gid), compute_dtype)

    _, y = jax.lax.scan(step, None, (xt, tile_ids.astype(jnp.int32)))
    return y.reshape(t * block_m, -1)


# ---------------------------------------------------------------------------
# Pallas MXU W8 kernel: int8 weights, per-128 scales on partial sums
# ---------------------------------------------------------------------------

def _make_mxu8_kernel(n_k_tiles: int, kb: int, a8: bool, prefetch: bool):
    """Depth-128 dots with the scale applied to each partial sum.

    a8=True: x int8, int8xint8 -> int32 MXU dots (2x MXU rate).
    a8=False: x bf16, mixed bf16xint8 -> f32 dots (no activation quant).
    Either way the VPU does one convert+fma per (128-block, m, n) — K/128
    fewer elementwise ops than dequant-to-float kernels.
    """

    def kernel(*refs):
        if prefetch:
            refs = refs[1:]
        x_ref, q_ref, s_ref, o_ref, acc = refs
        if prefetch:
            q_ref = q_ref.at[0]
            s_ref = s_ref.at[0]
        kt = pl.program_id(2)

        @pl.when(kt == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        a = None
        for t in range(kb):
            xs = x_ref[:, t * 128:(t + 1) * 128]
            ws = q_ref[t * 128:(t + 1) * 128, :]
            if a8:
                p = jnp.dot(xs, ws,
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32)
            else:
                p = jnp.dot(xs, ws, preferred_element_type=jnp.float32)
            contrib = p * s_ref[t, :][None, :]
            a = contrib if a is None else a + contrib
        acc[...] += a

        @pl.when(kt == n_k_tiles - 1)
        def _():
            o_ref[...] = acc[...]

    return kernel


def _quantize_activations(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8: x [M, K] -> (x8, scale [M, 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = absmax / 127.0
    inv = jnp.where(sx > 0, 1.0 / jnp.where(sx == 0, 1.0, sx), 0.0)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                  -127, 127).astype(jnp.int8)
    return x8, sx


def _qmatmul_pallas_mxu8(x: jax.Array, lin: QLinear, a8: bool,
                         block_n: int | None = None, block_m: int = 256,
                         block_k: int = 2048,
                         layer: jax.Array | None = None,
                         interpret: bool = False) -> jax.Array:
    m, k = x.shape
    n = lin.out_features
    g = lin.scale_group  # 128
    prefetch = layer is not None
    min_bm = 32 if a8 else 16
    bm = min(_round_up(m, min_bm), block_m)
    bn = _pick_bn(n, block_n or _ENV_BN)
    # K tile: multiple of the scale group dividing K; scales-block
    # sublane dim (bk/g) must be 8-aligned or span the whole K
    bk = 0
    for cand in (block_k, 4096, 2048, 1024):
        if cand <= k and k % cand == 0 and cand % g == 0 \
                and ((cand // g) % 8 == 0 or cand == k):
            bk = cand
            break
    if not bk and k % g == 0 and k <= 16384:
        bk = k
    if bn is None or not bk:
        return _qmatmul_xla(x, _slice_layer(lin, layer),
                            jnp.bfloat16)
    if a8:
        x8, sx = _quantize_activations(x)
    else:
        x8, sx = x.astype(jnp.bfloat16), None
    pad_m = _round_up(m, bm) - m
    if pad_m:
        x8 = jnp.pad(x8, ((0, pad_m), (0, 0)))
    n_k_tiles = k // bk
    kb = bk // g
    grid = (x8.shape[0] // bm, n // bn, n_k_tiles)

    if prefetch:
        q_spec = pl.BlockSpec((1, bk, bn), lambda i, j, t, L: (L[0], t, j))
        s_spec = pl.BlockSpec((1, kb, bn), lambda i, j, t, L: (L[0], t, j))
        x_spec = pl.BlockSpec((bm, bk), lambda i, j, t, L: (i, t))
        o_spec = pl.BlockSpec((bm, bn), lambda i, j, t, L: (i, j))
    else:
        q_spec = pl.BlockSpec((bk, bn), lambda i, j, t: (t, j))
        s_spec = pl.BlockSpec((kb, bn), lambda i, j, t: (t, j))
        x_spec = pl.BlockSpec((bm, bk), lambda i, j, t: (i, t))
        o_spec = pl.BlockSpec((bm, bn), lambda i, j, t: (i, j))

    kernel = _make_mxu8_kernel(n_k_tiles, kb, a8, prefetch)
    cost = pl.CostEstimate(
        flops=2 * x8.shape[0] * n * k,
        bytes_accessed=k * n + x8.size + 4 * x8.shape[0] * n + 4 * kb * n,
        transcendentals=0,
    )
    common = dict(
        out_shape=jax.ShapeDtypeStruct((x8.shape[0], n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    if prefetch:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[x_spec, q_spec, s_spec],
                out_specs=o_spec,
                scratch_shapes=scratch,
            ),
            **common,
        )(jnp.asarray(layer, jnp.int32).reshape(1), x8, lin.q, lin.scales)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[x_spec, q_spec, s_spec],
            out_specs=o_spec,
            scratch_shapes=scratch,
            **common,
        )(x8, lin.q, lin.scales)
    if pad_m:
        out = out[:m]
    if sx is not None:
        out = out * sx
    return out


# ---------------------------------------------------------------------------
# Pallas fused kernel (K-tiled, f32 accumulator)
# ---------------------------------------------------------------------------

def _unpack_nibbles_tile(q_ref, groups_per_tile: int, group_rows: int,
                         unpack_mode: str):
    """uint8 tile [(g*G/2), bn] -> f32 nibble values [(g*G), bn] in
    natural k order. Each pack group's halves are split with STATIC
    slices, so multi-group tiles need no sublane reshapes."""
    pieces = []
    half = group_rows // 2
    for g in range(groups_per_tile):
        part = q_ref[g * half : (g + 1) * half, :]
        if unpack_mode == "i16":
            p16 = part.astype(jnp.int16)
            lo = (p16 & 0xF).astype(jnp.float32)
            hi = (p16 >> 4).astype(jnp.float32)
        elif unpack_mode == "i32":
            p32 = part.astype(jnp.int32)
            lo = (p32 & 0xF).astype(jnp.float32)
            hi = (p32 >> 4).astype(jnp.float32)
        else:  # "float": u8 -> f32 once, split with mul/floor/fma
            qf = (part.astype(jnp.float32) if _UNPACK_DIRECT
                  else part.astype(jnp.int32).astype(jnp.float32))
            hi = jnp.floor(qf * (1.0 / 16.0))
            lo = qf - hi * 16.0
        pieces.append(lo)
        pieces.append(hi)
    return jnp.concatenate(pieces, axis=0)


def _make_kernel(unsigned: bool, packed: bool, has_bias: bool, compute_dtype,
                 n_k_tiles: int, prefetch: bool, groups_per_tile: int,
                 group_rows: int, unpack_mode: str, bsum: bool = False,
                 f32dot: bool = False):
    def kernel(*refs):
        if prefetch:  # scalar-prefetch layer index comes first
            refs = refs[1:]
        if bsum:
            x_ref, xb_ref, *refs = refs
        else:
            x_ref, *refs = refs
            xb_ref = None
        if has_bias:
            q_ref, s_ref, b_ref, o_ref, acc = refs
        else:
            q_ref, s_ref, o_ref, acc = refs
            b_ref = None
        if prefetch:  # blocks carry a leading layer dim of size 1
            q_ref = q_ref.at[0]
            s_ref = s_ref.at[0]
            if b_ref is not None:
                b_ref = b_ref.at[0]
        kt = pl.program_id(2)
        ar_dtype = jnp.float32
        if packed and bsum:
            # per-piece mul-only dequant (no concat, no per-element
            # additive term): the zero point / Q4_K min contributes
            # sum_k x[k]*off[k//32] = dot(blocksum(x), off) — one small
            # MXU dot on the [K/32, bn] block tensor instead of a repeat
            # + fma over every [bk, bn] tile (measured 82.5 -> 78 us on
            # 4096x14336 Q4_K M=1). s_ref/b_ref hold the FULL K range
            # (re-used across K-steps; same total HBM bytes), tiles
            # dynamic-slice their scale rows.
            kb = s_ref.shape[-2] // n_k_tiles  # scale blocks per K-tile

            @pl.when(kt == 0)
            def _():
                xb = xb_ref[...].astype(compute_dtype)
                if unsigned:
                    # w = nib*s - b  ->  bias term -dot(xb, b)
                    acc[...] = -jnp.dot(
                        xb, b_ref[...].astype(compute_dtype),
                        preferred_element_type=jnp.float32)
                else:
                    # nibbles stored biased (+8): w = nib*s - 8*s
                    acc[...] = -8.0 * jnp.dot(
                        xb, s_ref[...].astype(compute_dtype),
                        preferred_element_type=jnp.float32)

            half = group_rows // 2
            a = None
            xall = x_ref[...].astype(compute_dtype)
            for g in range(groups_per_tile):
                part = q_ref[g * half:(g + 1) * half, :]
                qf = (part.astype(jnp.float32) if _UNPACK_DIRECT
                      else part.astype(jnp.int32).astype(jnp.float32))
                hi = jnp.floor(qf * (1.0 / 16.0))
                lo = qf - hi * 16.0
                kbh = half // QK
                s0 = kt * kb + g * 2 * kbh
                s_lo = jnp.repeat(
                    s_ref[pl.ds(s0, kbh), :].astype(ar_dtype),
                    QK, axis=0)
                s_hi = jnp.repeat(
                    s_ref[pl.ds(s0 + kbh, kbh), :].astype(ar_dtype),
                    QK, axis=0)
                if f32dot:
                    # decode-sized M: keep the scaled planes in f32 and
                    # dot at f32 MXU rate — the 2 astype(bf16) VPU
                    # passes cost more than the tiny-M dot (measured
                    # 75.9-81 -> 71.6 us on 4096x14336 M=1; bf16 scale
                    # arithmetic was WORSE at 105 us, .bench_unpack.py)
                    w_lo, w_hi = lo * s_lo, hi * s_hi
                else:
                    w_lo = (lo * s_lo).astype(compute_dtype)
                    w_hi = (hi * s_hi).astype(compute_dtype)
                x_lo = xall[:, g * group_rows:g * group_rows + half]
                x_hi = xall[:, g * group_rows + half:(g + 1) * group_rows]
                if f32dot:
                    x_lo = x_lo.astype(jnp.float32)
                    x_hi = x_hi.astype(jnp.float32)
                p = jnp.dot(x_lo, w_lo,
                            preferred_element_type=jnp.float32) \
                    + jnp.dot(x_hi, w_hi,
                              preferred_element_type=jnp.float32)
                a = p if a is None else a + p
            acc[...] += a
        else:

            @pl.when(kt == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            s = jnp.repeat(s_ref[...].astype(ar_dtype), QK, axis=0)
            if packed:
                # 4-bit zero point folds into the per-block additive term
                # (w = nib * s + off); nibbles are stored biased (+8)
                nib = _unpack_nibbles_tile(q_ref, groups_per_tile,
                                           group_rows, unpack_mode)
                if unsigned:
                    off = (-jnp.repeat(b_ref[...].astype(ar_dtype), QK,
                                       axis=0)
                           if b_ref is not None else ar_dtype(0.0))
                else:
                    off = ar_dtype(-8.0) * s
                w = (nib * s + off).astype(compute_dtype)
            else:
                w = q_ref[...].astype(ar_dtype) * s
                if b_ref is not None:
                    w = w - jnp.repeat(b_ref[...].astype(ar_dtype), QK,
                                       axis=0)
                w = w.astype(compute_dtype)
            acc[...] += jnp.dot(x_ref[...].astype(compute_dtype), w,
                                preferred_element_type=jnp.float32)

        @pl.when(kt == n_k_tiles - 1)
        def _():
            o_ref[...] = acc[...]

    return kernel


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_bn(n: int, prefer: int) -> int | None:
    # 768/384 matter for vocab-shaped N: 128256 = 2^8*3*167 rejects
    # 512, and the old ladder fell to bn=256 -> 501 grid tiles per
    # lm_head call. When `prefer` itself does not divide n, a one-rung
    # overshoot to 768 (167 tiles) is allowed: measured 10.77 -> 10.64
    # ms on the full decode step and -0.7 ms on the EAGLE spec step
    # (.bench_lmhead_bn.py); shapes where `prefer` divides keep it.
    if n % prefer and prefer >= 384 and n % 768 == 0:
        return 768
    for bn in (prefer, 512, 384, 256, 128):
        if bn <= prefer and n % bn == 0:
            return bn
    return None


import os as _os

# tuning knobs (see tools/bench_kernels.py sweeps; defaults from the
# v5e sweep: groups=2 + float unpack won at 4096x14336 decode shapes)
_ENV_BN = int(_os.environ.get("POWERSERVE_QMM_BN", "512"))
_ENV_GROUPS = int(_os.environ.get("POWERSERVE_QMM_GROUPS", "8"))
_ENV_UNPACK = _os.environ.get("POWERSERVE_QMM_UNPACK", "float")
# W8 MXU kernel activations: int8 (2x MXU rate, per-token quant) or bf16
_ENV_A8 = _os.environ.get("POWERSERVE_QMM_ACT", "a8") == "a8"

# per-shape autotune table (tools/autotune.py): {"<mclass>:<K>:<N>":
# {"bn": int, "groups": int}}; mclass buckets M into decode (<=16) /
# prefill. Loaded from POWERSERVE_QMM_TUNE or a workspace qmm_tune.json
# (models/loader.py calls load_tune_table at model load).
_TUNE: dict[str, dict] = {}


def mclass(m: int) -> str:
    return "decode" if m <= 16 else "prefill"


def load_tune_table(path) -> int:
    """Merge a qmm_tune.json into the active override table. Returns
    the number of entries loaded (0 if the file is absent).

    The table is process-global and knobs are read at TRACE time, so a
    shape that was already jitted keeps its original knobs regardless
    of later loads; on a conflicting re-load (multi-model server with
    different tunings for the same (mclass, K, N)) the FIRST entry is
    kept — it matches the compiled executables — and a warning is
    logged."""
    import json
    from pathlib import Path

    p = Path(path)
    if not p.exists():
        return 0
    entries = json.loads(p.read_text())
    n = 0
    for k, v in entries.items():
        old = _TUNE.get(k)
        if old is not None and old != v:
            import logging

            logging.getLogger("powerserve.qmatmul").warning(
                f"qmm tune conflict for {k}: keeping {old}, ignoring {v} "
                f"(knobs bind at first trace)")
            continue
        _TUNE[k] = v
        n += 1
    return n


if _os.environ.get("POWERSERVE_QMM_TUNE"):
    load_tune_table(_os.environ["POWERSERVE_QMM_TUNE"])


def _select_knobs(m: int, k: int, n: int) -> tuple[int, int]:
    """(preferred bn, max groups-per-K-tile) for this shape: the
    autotuned per-shape entry when present, else the env/global
    defaults (VMEM caps in _qmatmul_pallas still apply)."""
    e = _TUNE.get(f"{mclass(m)}:{k}:{n}")
    if e:
        return int(e.get("bn", _ENV_BN)), int(e.get("groups", _ENV_GROUPS))
    return _ENV_BN, _ENV_GROUPS


def _qmatmul_pallas(x: jax.Array, lin: QLinear, compute_dtype: Any,
                    block_n: int | None = None, block_m: int = 256,
                    block_k: int = 2048, layer: jax.Array | None = None,
                    tile_ids: jax.Array | None = None,
                    interpret: bool = False) -> jax.Array:
    m, k = x.shape
    n = lin.out_features
    grouped = tile_ids is not None  # per-M-tile slab index (MoE dispatch)
    # weights stacked [L, ...], slab picked via SMEM scalar prefetch —
    # either one index for the whole call (layer) or one per M tile
    # (tile_ids; grouped MoE dispatch, ops/moe.py)
    prefetch = layer is not None or grouped
    if grouped:
        assert layer is None and m % block_m == 0
    bm = min(_round_up(m, 16), block_m)
    tune_bn, tune_groups = _select_knobs(m, k, n)
    bn = _pick_bn(n, block_n or tune_bn)

    def _fallback():
        if grouped:
            return _qmatmul_xla_grouped(x, lin, tile_ids, block_m,
                                        compute_dtype)
        return _qmatmul_xla(x, _slice_layer(lin, layer), compute_dtype)
    # K tile: whole pack groups when packed (each group's halves split
    # with static slices in-kernel); else the largest 64-aligned divisor.
    # Mosaic constraint: the scales block's sublane dim (bk/32) must be
    # divisible by 8 OR span the whole array (bk == K).
    def _tile_ok(bk_: int) -> bool:
        return k % bk_ == 0 and ((bk_ // QK) % 8 == 0 or bk_ == k)

    # K-tile sizing vs VMEM: fat full-K tiles win at decode shapes
    # (bm=16; 8B down-proj 101 -> 84us) but together with the unpack
    # temporaries they blow the 16MB scoped-vmem limit once bm grows
    # (measured: bm=256 prefill and bm=48 spec-verify both OOM at
    # bk=14336). Keep fat tiles for decode-sized M only; larger M uses
    # the long-proven <=2-group tiles.
    gpt_max = max(tune_groups, 1) if bm <= 16 else min(tune_groups, 2)
    x_budget = 4 << 20

    def _fits(bk_: int) -> bool:
        return bm * bk_ * 2 <= x_budget

    try:
        group = lin.pack_group if lin.packed else 0
        if lin.packed:
            bk = 0
            for gpt in range(gpt_max, 0, -1):
                if _tile_ok(group * gpt) and _fits(group * gpt):
                    bk, n_groups = group * gpt, gpt
                    break
            if not bk and k <= 8192 and k % group == 0 and _fits(k):
                bk, n_groups = k, k // group  # single full-K tile
            if not bk:
                return _fallback()
        else:
            n_groups = 1
            bk = choose_pack_group(k, block_k)
            if not _tile_ok(bk) or not _fits(bk):
                bk = k if (k <= 8192 and _fits(k)) else 0
            if not bk:
                return _fallback()
    except ValueError:
        return _fallback()
    if bn is None:
        return _fallback()
    pad_m = _round_up(m, bm) - m
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    n_k_tiles = k // bk
    grid = (x.shape[0] // bm, n // bn, n_k_tiles)
    kb = bk // QK
    qrows = bk // 2 if lin.packed else bk
    # bsum path: zero-point/min contribution via a blocksum(x) dot in
    # the kernel (mul-only dequant); needs whole pack-group halves to
    # be scale-block aligned (group % 64 == 0 guarantees it). It also
    # dynamic-slices the scale slab at per-half-group row offsets
    # (s0 = kt*kb + g*2*kbh, s0 + kbh with kbh = group/64): Mosaic
    # requires those starts provably 8-aligned, so group % 512 must
    # hold (kbh % 8 == 0) — qwen-sized K (896 -> group 896, kbh 14)
    # fails the vector-load alignment check otherwise and falls back
    # to the plain packed kernel, which reads whole scale blocks.
    bsum = (lin.packed and _ENV_UNPACK == "float"
            and (group // 64) % 8 == 0)

    nb_total = k // QK  # all scale blocks (bsum: s/b blocks span full K)
    if prefetch:
        # slab index: L[0] for a whole-call layer, L[i] per M tile (MoE
        # grouped dispatch — each tile's rows belong to one expert)
        pick = (lambda i, L: L[i]) if grouped else (lambda i, L: L[0])
        q_spec = pl.BlockSpec((1, qrows, bn),
                              lambda i, j, t, L: (pick(i, L), t, j))
        if bsum:
            s_spec = pl.BlockSpec((1, nb_total, bn),
                                  lambda i, j, t, L: (pick(i, L), 0, j))
        else:
            s_spec = pl.BlockSpec((1, kb, bn),
                                  lambda i, j, t, L: (pick(i, L), t, j))
        x_spec = pl.BlockSpec((bm, bk), lambda i, j, t, L: (i, t))
        xb_spec = pl.BlockSpec((bm, nb_total), lambda i, j, t, L: (i, 0))
        o_spec = pl.BlockSpec((bm, bn), lambda i, j, t, L: (i, j))
    else:
        q_spec = pl.BlockSpec((qrows, bn), lambda i, j, t: (t, j))
        if bsum:
            s_spec = pl.BlockSpec((nb_total, bn), lambda i, j, t: (0, j))
        else:
            s_spec = pl.BlockSpec((kb, bn), lambda i, j, t: (t, j))
        x_spec = pl.BlockSpec((bm, bk), lambda i, j, t: (i, t))
        xb_spec = pl.BlockSpec((bm, nb_total), lambda i, j, t: (i, 0))
        o_spec = pl.BlockSpec((bm, bn), lambda i, j, t: (i, j))

    in_specs = [x_spec]
    inputs = [x]
    if bsum:
        xb = x.astype(jnp.float32).reshape(x.shape[0], k // QK, QK
                                           ).sum(-1).astype(x.dtype)
        in_specs.append(xb_spec)
        inputs.append(xb)
    in_specs += [q_spec, s_spec]
    inputs += [lin.q, lin.scales]
    if lin.bias is not None:
        in_specs.append(s_spec)
        inputs.append(lin.bias)
    # f32 dots for decode-sized M in the bsum kernel (skip the
    # astype(bf16) of the scaled planes): wins at M=1 where the dot is
    # tiny; at prefill M the f32 MXU rate penalty dominates — gate on
    # bm. _BSUM_VARIANT: -1 forces off, 1 forces on (probe override).
    f32dot = (bsum and bm <= 16 and _BSUM_VARIANT >= 0) \
        or (bsum and _BSUM_VARIANT == 1)
    kernel = _make_kernel(lin.unsigned, lin.packed, lin.bias is not None,
                          compute_dtype, n_k_tiles, prefetch,
                          n_groups, group, _ENV_UNPACK, bsum=bsum,
                          f32dot=f32dot)
    q_bytes = k * n * lin.q.dtype.itemsize // (2 if lin.packed else 1)
    # POWERSERVE_COST_SCALE: probe knob for Mosaic's pipeliner — scales
    # the advertised bytes/flops (CLAUDE "double-buffer tuning via
    # CostEstimate"; measured ~0 effect, see .bench_costscale note)
    _cs = float(_os.environ.get("POWERSERVE_COST_SCALE", "1"))
    cost = pl.CostEstimate(
        flops=int(2 * m * n * k * _cs),
        bytes_accessed=int((q_bytes + x.size * x.dtype.itemsize
                            + 4 * m * n) * _cs),
        transcendentals=0,
    )
    common = dict(
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    if prefetch:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=o_spec,
                scratch_shapes=common.pop("scratch_shapes"),
            ),
            **{k2: v for k2, v in common.items() if k2 != "scratch_shapes"},
        )(tile_ids.astype(jnp.int32) if grouped
          else jnp.asarray(layer, jnp.int32).reshape(1), *inputs)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=o_spec,
            **common,
        )(*inputs)
    if pad_m:
        out = out[:m]
    return out


def _slice_layer(lin: QLinear, layer: jax.Array | None) -> QLinear:
    """Dynamic-index stacked [L, ...] weights down to one layer."""
    if layer is None:
        return lin
    import dataclasses

    take = functools.partial(jnp.take, indices=layer, axis=0)
    return dataclasses.replace(
        lin, q=take(lin.q), scales=take(lin.scales),
        bias=None if lin.bias is None else take(lin.bias))


def qmatmul(x: jax.Array, lin: QLinear, *, backend: str = "auto",
            compute_dtype: Any = jnp.bfloat16,
            layer: jax.Array | None = None) -> jax.Array:
    """y = x @ dequant(lin); x [M, K] -> y [M, N] float32.

    backend: "auto" | "pallas" | "xla" | "pallas_interpret".
    layer: when lin holds stacked [L, ...] weights (lax.scan over
    layers), the traced layer index — the Pallas kernel reads the right
    slab directly from HBM via scalar prefetch, avoiding the per-layer
    slice copy XLA would otherwise materialize before the opaque call.
    """
    if x.ndim != 2:
        lead = x.shape[:-1]
        y = qmatmul(x.reshape(-1, x.shape[-1]), lin, backend=backend,
                    compute_dtype=compute_dtype, layer=layer)
        return y.reshape(*lead, -1)
    if backend == "auto":
        backend = "pallas" if _is_tpu() else "xla"
    # tiny/unaligned shapes: Mosaic layout inference rejects the repeat/
    # concat patterns — XLA handles them fine and perf doesn't matter there
    if backend == "pallas" and (lin.in_features < 512
                                or lin.out_features % 128 != 0):
        backend = "xla"
    mxu = lin.scale_group != QK  # W8 format: int8 MXU kernel
    if backend == "pallas":
        if mxu:
            return _qmatmul_pallas_mxu8(x, lin, _ENV_A8, layer=layer)
        return _qmatmul_pallas(x, lin, compute_dtype, layer=layer)
    if backend == "pallas_interpret":
        if mxu:
            return _qmatmul_pallas_mxu8(x, lin, _ENV_A8, layer=layer,
                                        interpret=True)
        return _qmatmul_pallas(x, lin, compute_dtype, layer=layer,
                               interpret=True)
    return _qmatmul_xla(x, _slice_layer(lin, layer), compute_dtype)


def qmatmul_grouped(x: jax.Array, lin: QLinear, tile_ids: jax.Array, *,
                    block_m: int, backend: str = "auto",
                    compute_dtype: Any = jnp.bfloat16) -> jax.Array:
    """Grouped quantized matmul: rows [i*block_m, (i+1)*block_m) of x
    multiply stacked slab lin[tile_ids[i]].

    The MoE top-k dispatch path (ops/moe.py): tokens sorted by routed
    expert, each expert's segment padded to block_m, so one kernel call
    computes only routed (token, expert) pairs — E/k fewer FLOPs than
    dense-all-experts at prefill — while the per-tile scalar-prefetch
    index reads only that tile's expert slab from HBM (the same
    mechanism as the stacked-layer index; reference runs MoE as per-row
    expert matmuls on CPU, libs/ggml mul_mat_id).

    x: [P, K] with P % block_m == 0; tile_ids: int32 [P // block_m].
    """
    assert x.ndim == 2 and x.shape[0] % block_m == 0
    if backend == "auto":
        backend = "pallas" if _is_tpu() else "xla"
    if backend == "pallas" and (lin.in_features < 512
                                or lin.out_features % 128 != 0):
        backend = "xla"
    if lin.scale_group != QK:  # W8 MXU format: no grouped kernel yet
        backend = "xla"
    if backend == "pallas":
        return _qmatmul_pallas(x, lin, compute_dtype, block_m=block_m,
                               tile_ids=tile_ids)
    if backend == "pallas_interpret":
        return _qmatmul_pallas(x, lin, compute_dtype, block_m=block_m,
                               tile_ids=tile_ids, interpret=True)
    return _qmatmul_xla_grouped(x, lin, tile_ids, block_m, compute_dtype)
