"""Elementwise / normalization / rotary ops.

These are plain jnp — XLA fuses them into neighbouring matmuls, so no
Pallas needed (reference equivalents: rms_norm ggml.cpp, silu_hadamard
src/backend/ggml/ggml.cpp:100-116, rope libs/ggml rope kernels).
Residuals and norms compute in float32 per the reference numerics spec
(tools/qnn_converter/export_to_onnx.py keeps fp32 residual/RMSNorm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import RopeConfig

ROPE_TYPE_NORM = 0  # rotate adjacent pairs (GGUF llama layout, permuted Wq/Wk)
ROPE_TYPE_NEOX = 2  # rotate split halves (HF layout, qwen2/neox)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm in f32: x / rms(x) * w (reference norm_attention.cpp:38)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)) * weight.astype(jnp.float32)


def silu_hadamard(gate: jax.Array, up: jax.Array) -> jax.Array:
    """silu(gate) * up (reference src/backend/ggml/ggml.cpp:100-116)."""
    g = gate.astype(jnp.float32)
    return (g * jax.nn.sigmoid(g) * up.astype(jnp.float32))


def rope_frequencies(cfg: RopeConfig, head_dim: int) -> jax.Array:
    """Per-pair inverse frequencies [head_dim // 2] float32."""
    half = head_dim // 2
    exponents = jnp.arange(0, half, dtype=jnp.float32) / half
    return 1.0 / (cfg.freq_base ** exponents) * cfg.freq_scale


def rope_cos_sin(positions: jax.Array, cfg: RopeConfig,
                 head_dim: int) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions: [..., head_dim // 2]."""
    inv_freq = rope_frequencies(cfg, head_dim)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles) * cfg.attn_factor, jnp.sin(angles) * cfg.attn_factor


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               rope_type: int = ROPE_TYPE_NEOX) -> jax.Array:
    """Rotate head vectors.

    x: [..., T, n_heads, head_dim]; cos/sin: [..., T, head_dim//2]
    (broadcast over the heads axis).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    if rope_type == ROPE_TYPE_NEOX:
        half = x.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    else:  # NORM: adjacent pairs (x[2i], x[2i+1])
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        r1 = x1 * c - x2 * s
        r2 = x2 * c + x1 * s
        out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(dtype)
