"""Quantized matmul: GGUF-family weights kept quantized in HBM, dequant
fused into the matmul (TPU replacement for the reference's ggml CPU
kernels and QNN int4 graphs — reference libs/ggml/src/ggml.c
powerserve_compute_forward_mul_mat and tools/qnn_converter int4 recipe).

Weight layout (see core/quant.py): contraction dim K on sublanes, output
dim N on lanes.

  y[m, n] = sum_k x[m, k] * (q[k, n] * scales[k//32, n] - bias[k//32, n])

Two storage forms:
  - unpacked: q int8 [K, N]            (1 byte / weight in HBM)
  - packed:   q uint8 [K//2, N]        (0.5 byte / weight; row i packs
              k=i in the low nibble and k=i+K/2 in the high nibble, so
              unpack = concat of two shifted copies along sublanes)

Three backends:
  - "xla":    jnp dequant + matmul; XLA fuses the dequant into the
              matmul's operand pipeline. Baseline + CPU-test path.
  - "pallas": fused kernel, grid over (M, N) tiles with full-K tiles
              resident in VMEM (LLM K <= ~32k fits comfortably).
  - "auto":   pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quant import QK, QuantizedTensor, pack_nib4


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scales", "bias"],
    meta_fields=["packed", "unsigned", "in_features", "out_features"],
)
@dataclass
class QLinear:
    """Quantized linear layer parameters (a jax pytree)."""

    q: jax.Array  # int8 [K, N] or uint8 [K//2, N] when packed
    scales: jax.Array  # f32 [K//32, N]
    bias: jax.Array | None  # f32 [K//32, N] (Q4_K additive min) or None
    packed: bool
    unsigned: bool  # True: nibbles are 0..15 (Q4_K); False: signed int
    in_features: int
    out_features: int

    @classmethod
    def from_quantized(cls, qt: QuantizedTensor, pack: bool = True,
                       scale_dtype: Any = jnp.float32) -> "QLinear":
        """Build device arrays from a repacked numpy QuantizedTensor."""
        from ..core.gguf import GGMLType

        is4bit = qt.ggml_type in (GGMLType.Q4_0, GGMLType.Q4_K)
        packed = bool(pack and is4bit and qt.k % 2 == 0)
        unsigned = qt.ggml_type == GGMLType.Q4_K
        if packed:
            qdev = jnp.asarray(pack_nib4(qt.q))
        else:
            qdev = jnp.asarray(qt.q)
        scales = jnp.asarray(qt.scales.astype(np.float32), dtype=scale_dtype)
        bias = None
        if qt.bias is not None:
            bias = jnp.asarray(qt.bias.astype(np.float32), dtype=scale_dtype)
        return cls(qdev, scales, bias, packed, unsigned, qt.k, qt.n)

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


def _unpack_nibbles(p: jax.Array, unsigned: bool) -> jax.Array:
    """uint8 [K//2, N] -> int8 [K, N] (concat along axis 0, natural k)."""
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    q = jnp.concatenate([lo, hi], axis=0)
    if not unsigned:
        q = ((q ^ 8) - 8).astype(jnp.int8)  # sign-extend 4-bit two's complement
    return q


def _dequant_full(lin: QLinear, dtype: Any) -> jax.Array:
    q = _unpack_nibbles(lin.q, lin.unsigned) if lin.packed else lin.q
    w = q.astype(dtype) * jnp.repeat(lin.scales.astype(dtype), QK, axis=0)
    if lin.bias is not None:
        w = w - jnp.repeat(lin.bias.astype(dtype), QK, axis=0)
    return w


def _qmatmul_xla(x: jax.Array, lin: QLinear, compute_dtype: Any) -> jax.Array:
    w = _dequant_full(lin, compute_dtype)
    return jnp.dot(x.astype(compute_dtype), w,
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _make_kernel(unsigned: bool, packed: bool, has_bias: bool, compute_dtype):
    def kernel(*refs):
        if has_bias:
            x_ref, q_ref, s_ref, b_ref, o_ref = refs
        else:
            x_ref, q_ref, s_ref, o_ref = refs
            b_ref = None
        qv = q_ref[...]
        if packed:
            # Mosaic can't shift i8 vectors — widen to i32 for the unpack.
            q32 = qv.astype(jnp.int32)
            lo = q32 & 0xF
            hi = q32 >> 4
            qi = jnp.concatenate([lo, hi], axis=0)
            if not unsigned:
                qi = (qi ^ 8) - 8  # sign-extend 4-bit two's complement
        else:
            qi = qv
        s = jnp.repeat(s_ref[...].astype(compute_dtype), QK, axis=0)
        w = qi.astype(compute_dtype) * s
        if b_ref is not None:
            w = w - jnp.repeat(b_ref[...].astype(compute_dtype), QK, axis=0)
        o_ref[...] = jnp.dot(
            x_ref[...].astype(compute_dtype), w,
            preferred_element_type=jnp.float32,
        )

    return kernel


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _qmatmul_pallas(x: jax.Array, lin: QLinear, compute_dtype: Any,
                    block_n: int = 512, block_m: int = 256,
                    interpret: bool = False) -> jax.Array:
    m, k = x.shape
    n = lin.out_features
    kb = k // QK
    bm = min(_round_up(m, 16), block_m)
    bn = min(block_n, n)
    if n % bn != 0:  # fall back for awkward N
        return _qmatmul_xla(x, lin, compute_dtype)
    pad_m = _round_up(m, bm) - m
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    grid = (x.shape[0] // bm, n // bn)
    qrows = k // 2 if lin.packed else k
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
        pl.BlockSpec((qrows, bn), lambda i, j: (0, j)),
        pl.BlockSpec((kb, bn), lambda i, j: (0, j)),
    ]
    inputs = [x, lin.q, lin.scales]
    if lin.bias is not None:
        in_specs.append(pl.BlockSpec((kb, bn), lambda i, j: (0, j)))
        inputs.append(lin.bias)
    kernel = _make_kernel(lin.unsigned, lin.packed, lin.bias is not None,
                          compute_dtype)
    q_bytes = lin.q.size * lin.q.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=q_bytes + x.size * x.dtype.itemsize + 4 * m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    if pad_m:
        out = out[:m]
    return out


def qmatmul(x: jax.Array, lin: QLinear, *, backend: str = "auto",
            compute_dtype: Any = jnp.bfloat16) -> jax.Array:
    """y = x @ dequant(lin); x [M, K] -> y [M, N] float32.

    backend: "auto" | "pallas" | "xla".
    """
    if x.ndim != 2:
        lead = x.shape[:-1]
        y = qmatmul(x.reshape(-1, x.shape[-1]), lin, backend=backend,
                    compute_dtype=compute_dtype)
        return y.reshape(*lead, -1)
    if backend == "auto":
        backend = "pallas" if _is_tpu() else "xla"
    # tiny/unaligned shapes: Mosaic layout inference rejects the repeat/
    # concat patterns — XLA handles them fine and perf doesn't matter there
    if backend == "pallas" and (lin.in_features < 512
                                or lin.out_features % 128 != 0):
        backend = "xla"
    if backend == "pallas":
        return _qmatmul_pallas(x, lin, compute_dtype)
    if backend == "pallas_interpret":
        return _qmatmul_pallas(x, lin, compute_dtype, interpret=True)
    return _qmatmul_xla(x, lin, compute_dtype)
