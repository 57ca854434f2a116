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
    """Per-pair EXTRAPOLATION inverse frequencies [head_dim // 2] f32
    (before freq_scale/YaRN interpolation), with llama3-style per-dim
    frequency factors applied when configured.

    llama3 recipe (HF `_compute_llama3_parameters` == ggml freq_factors
    from llama.cpp's rope_freqs tensor): frequencies whose wavelength
    exceeds `n_ctx_orig / low_freq_factor` are divided by
    `scaling_factor`; wavelengths below `n_ctx_orig / high_freq_factor`
    are kept; the band between is smoothly interpolated.
    """
    half = head_dim // 2
    exponents = jnp.arange(0, half, dtype=jnp.float32) / half
    inv_freq = 1.0 / (cfg.freq_base ** exponents)
    if cfg.scaling_type == "llama3":
        factor = cfg.scaling_factor
        lo_f, hi_f = cfg.low_freq_factor, cfg.high_freq_factor
        old_ctx = float(cfg.n_ctx_orig)
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (old_ctx / wavelen - lo_f) / max(hi_f - lo_f, 1e-6)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = jnp.where(wavelen < old_ctx / hi_f, inv_freq, scaled)
    return inv_freq


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float,
                   base: float) -> float:
    """ggml_rope_yarn_corr_dim (ggml.c:15338): pair index where n_rot
    full rotations fit in the original context."""
    import math
    return (n_dims * math.log(n_ctx_orig / (n_rot * 2.0 * math.pi))
            / (2.0 * math.log(base)))


def rope_cos_sin(positions: jax.Array, cfg: RopeConfig,
                 head_dim: int) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions: [..., head_dim // 2].

    ext_factor == 0 (default): plain linear scaling — angle =
    pos * inv_freq * freq_scale, magnitude attn_factor.
    ext_factor != 0: YaRN (ggml rope_yarn, ggml.c:15319-15334) — the
    per-dim ramp blends interpolated (freq_scale) and extrapolated
    angles between the beta_fast/beta_slow correction dims, and the
    magnitude picks up the 0.1*ln(1/freq_scale) entropy correction.
    """
    import math
    inv_freq = rope_frequencies(cfg, head_dim)
    theta_extrap = positions.astype(jnp.float32)[..., None] * inv_freq
    theta_interp = cfg.freq_scale * theta_extrap
    mscale = cfg.attn_factor
    if cfg.ext_factor != 0.0:
        n_dims = cfg.n_dims if cfg.n_dims > 0 else head_dim
        low = math.floor(_yarn_corr_dim(n_dims, cfg.n_ctx_orig,
                                        cfg.beta_fast, cfg.freq_base))
        high = math.ceil(_yarn_corr_dim(n_dims, cfg.n_ctx_orig,
                                        cfg.beta_slow, cfg.freq_base))
        low, high = max(low, 0.0), min(high, n_dims - 1.0)
        # rope_yarn_ramp over pair index i (== i0/2 in ggml's layout;
        # corr dims are already in pair units, ggml.c:15312-15315)
        i = jnp.arange(head_dim // 2, dtype=jnp.float32)
        y = (i - low) / max(0.001, high - low)
        ramp = (1.0 - jnp.clip(y, 0.0, 1.0)) * cfg.ext_factor
        theta = theta_interp * (1.0 - ramp) + theta_extrap * ramp
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / cfg.freq_scale))
    else:
        theta = theta_interp
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


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
