"""InternVL-style ViT vision encoder + multimodal projector (pure jnp).

TPU counterpart of the reference's NPU Vision graph (reference
qnn_backend.cpp:99-183 runs a precompiled vision context binary per
image patch; here the encoder is a jitted function). Math follows the
public InternVL vision architecture: patch-conv embeddings + cls token +
absolute position embeddings, pre-LN transformer blocks with
layer-scale (lambda_1/lambda_2), then pixel-shuffle downsampling and a
LayerNorm-MLP projector into the language model's embedding space.

Vision weights stay dense bf16 — the tower is small next to the LLM and
runs once per image (the reference keeps it fp16 on NPU similarly).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["qkv_w", "qkv_b", "proj_w", "proj_b", "fc1_w", "fc1_b",
                 "fc2_w", "fc2_b", "ln1_w", "ln1_b", "ln2_w", "ln2_b",
                 "lambda1", "lambda2"],
    meta_fields=[],
)
@dataclass
class ViTLayer:
    qkv_w: jax.Array  # [D, 3D] (q|k|v concat)
    qkv_b: jax.Array | None  # [3D]
    proj_w: jax.Array  # [D, D]
    proj_b: jax.Array
    fc1_w: jax.Array  # [D, F]
    fc1_b: jax.Array
    fc2_w: jax.Array  # [F, D]
    fc2_b: jax.Array
    ln1_w: jax.Array
    ln1_b: jax.Array
    ln2_w: jax.Array
    ln2_b: jax.Array
    lambda1: jax.Array | None  # layer scale
    lambda2: jax.Array | None


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["patch_w", "patch_b", "cls_token", "pos_embed", "layers",
                 "proj_ln_w", "proj_ln_b", "proj_fc1_w", "proj_fc1_b",
                 "proj_fc2_w", "proj_fc2_b"],
    meta_fields=["patch_size", "n_heads", "eps", "downsample"],
)
@dataclass
class VisionParams:
    patch_w: jax.Array  # [P*P*3, D] (flattened conv kernel)
    patch_b: jax.Array  # [D]
    cls_token: jax.Array  # [1, 1, D]
    pos_embed: jax.Array  # [1, 1+N, D]
    layers: ViTLayer  # stacked on leading axis
    # multimodal projector (vision D * (1/ds)^2 -> text dim)
    proj_ln_w: jax.Array
    proj_ln_b: jax.Array
    proj_fc1_w: jax.Array
    proj_fc1_b: jax.Array
    proj_fc2_w: jax.Array
    proj_fc2_b: jax.Array
    patch_size: int
    n_heads: int
    eps: float
    downsample: float


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """[B, 3, H, W] -> [B, (H/p)*(W/p), p*p*3] matching a stride-p conv
    (kernel layout [D, 3, p, p] flattened as 3*p*p per patch)."""
    B, C, H, W = pixel_values.shape
    x = pixel_values.reshape(B, C, H // patch, patch, W // patch, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, h, w, C, p, p]
    return x.reshape(B, (H // patch) * (W // patch), C * patch * patch)


def vision_encode(params: VisionParams, pixel_values: jax.Array) -> jax.Array:
    """[B, 3, H, W] -> patch features [B, N, D] (cls dropped)."""
    patches = patchify(pixel_values.astype(jnp.float32), params.patch_size)
    x = patches @ params.patch_w + params.patch_b  # [B, N, D]
    B, N, D = x.shape
    cls = jnp.broadcast_to(params.cls_token, (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params.pos_embed[:, : N + 1]
    H = params.n_heads
    hd = D // H
    scale = 1.0 / float(np.sqrt(hd))
    eps = params.eps

    def layer_step(x, lw: ViTLayer):
        h = _layer_norm(x, lw.ln1_w, lw.ln1_b, eps).astype(jnp.bfloat16)
        qkv = h @ lw.qkv_w.astype(jnp.bfloat16)
        if lw.qkv_b is not None:
            qkv = qkv + lw.qkv_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        T = x.shape[1]

        def heads(t):
            return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                         preferred_element_type=jnp.float32) * scale
        att = jax.nn.softmax(att, axis=-1).astype(jnp.bfloat16)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = out.astype(jnp.bfloat16) @ lw.proj_w.astype(jnp.bfloat16) + lw.proj_b
        if lw.lambda1 is not None:
            out = out * lw.lambda1
        x = x + out.astype(x.dtype)

        h2 = _layer_norm(x, lw.ln2_w, lw.ln2_b, eps).astype(jnp.bfloat16)
        m = jax.nn.gelu(h2 @ lw.fc1_w.astype(jnp.bfloat16) + lw.fc1_b,
                        approximate=False)
        m = m.astype(jnp.bfloat16) @ lw.fc2_w.astype(jnp.bfloat16) + lw.fc2_b
        if lw.lambda2 is not None:
            m = m * lw.lambda2
        return (x + m.astype(x.dtype)), None

    x = x.astype(jnp.float32)
    x, _ = jax.lax.scan(layer_step, x, params.layers)
    return x[:, 1:]  # drop cls (vision_feature_select_strategy="default")


def pixel_shuffle(feat: jax.Array, scale: float = 0.5) -> jax.Array:
    """[B, h, w, C] -> [B, h*s, w*s, C/s^2] (InternVL ordering)."""
    B, Wd, Ht, C = feat.shape
    feat = feat.reshape(B, Wd, int(Ht * scale), int(C / scale))
    feat = feat.transpose(0, 2, 1, 3)
    feat = feat.reshape(B, int(Ht * scale), int(Wd * scale),
                        int(C / (scale * scale)))
    return feat.transpose(0, 2, 1, 3)


def project_image_features(params: VisionParams,
                           feat: jax.Array) -> jax.Array:
    """Patch features [B, N, D] -> LLM embeddings [B, N*ds^2, text_dim]."""
    B, N, D = feat.shape
    side = int(np.sqrt(N))
    f = feat.reshape(B, side, side, D)
    f = pixel_shuffle(f, params.downsample)
    f = f.reshape(B, -1, f.shape[-1])
    h = _layer_norm(f, params.proj_ln_w, params.proj_ln_b, 1e-5)
    h = h @ params.proj_fc1_w + params.proj_fc1_b
    h = jax.nn.gelu(h, approximate=False)
    return h @ params.proj_fc2_w + params.proj_fc2_b


def encode_images(params: VisionParams, pixel_values: jax.Array) -> jax.Array:
    """Full pipeline: pixels -> projected LLM-space embeddings."""
    return project_image_features(params, vision_encode(params, pixel_values))


# ---------------------------------------------------------------------------
# HF weight loading
# ---------------------------------------------------------------------------

def vision_params_from_hf(sd: dict[str, np.ndarray], n_layers: int,
                          n_heads: int, patch_size: int = 14,
                          eps: float = 1e-6,
                          downsample: float = 0.5) -> VisionParams:
    """Build from an HF InternVL state dict (model.vision_tower.* and
    model.multi_modal_projector.*)."""

    def g(name):
        return np.asarray(sd[name], np.float32)

    pre = "model.vision_tower."
    conv = g(pre + "embeddings.patch_embeddings.projection.weight")
    D = conv.shape[0]
    # conv [D, 3, p, p] -> [3*p*p, D] matching patchify's (C, p, p) order
    patch_w = conv.reshape(D, -1).T.copy()
    layers = []
    for i in range(n_layers):
        lp = pre + f"encoder.layer.{i}."
        qkv_w = np.concatenate([
            g(lp + "attention.q_proj.weight").T,
            g(lp + "attention.k_proj.weight").T,
            g(lp + "attention.v_proj.weight").T], axis=1)
        qkv_b = None
        if lp + "attention.q_proj.bias" in sd:
            qkv_b = np.concatenate([
                g(lp + "attention.q_proj.bias"),
                g(lp + "attention.k_proj.bias"),
                g(lp + "attention.v_proj.bias")])
        layers.append(ViTLayer(
            qkv_w=jnp.asarray(qkv_w),
            qkv_b=None if qkv_b is None else jnp.asarray(qkv_b),
            proj_w=jnp.asarray(g(lp + "attention.projection_layer.weight").T),
            proj_b=jnp.asarray(g(lp + "attention.projection_layer.bias")),
            fc1_w=jnp.asarray(g(lp + "mlp.fc1.weight").T),
            fc1_b=jnp.asarray(g(lp + "mlp.fc1.bias")),
            fc2_w=jnp.asarray(g(lp + "mlp.fc2.weight").T),
            fc2_b=jnp.asarray(g(lp + "mlp.fc2.bias")),
            ln1_w=jnp.asarray(g(lp + "layernorm_before.weight")),
            ln1_b=jnp.asarray(g(lp + "layernorm_before.bias")),
            ln2_w=jnp.asarray(g(lp + "layernorm_after.weight")),
            ln2_b=jnp.asarray(g(lp + "layernorm_after.bias")),
            lambda1=jnp.asarray(g(lp + "lambda_1"))
            if lp + "lambda_1" in sd else None,
            lambda2=jnp.asarray(g(lp + "lambda_2"))
            if lp + "lambda_2" in sd else None,
        ))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)
    pp = "model.multi_modal_projector."
    return VisionParams(
        patch_w=jnp.asarray(patch_w),
        patch_b=jnp.asarray(g(pre + "embeddings.patch_embeddings.projection.bias")),
        cls_token=jnp.asarray(g(pre + "embeddings.cls_token")),
        pos_embed=jnp.asarray(g(pre + "embeddings.position_embeddings")),
        layers=stacked,
        proj_ln_w=jnp.asarray(g(pp + "layer_norm.weight")),
        proj_ln_b=jnp.asarray(g(pp + "layer_norm.bias")),
        proj_fc1_w=jnp.asarray(g(pp + "linear_1.weight").T),
        proj_fc1_b=jnp.asarray(g(pp + "linear_1.bias")),
        proj_fc2_w=jnp.asarray(g(pp + "linear_2.weight").T),
        proj_fc2_b=jnp.asarray(g(pp + "linear_2.bias")),
        patch_size=patch_size, n_heads=n_heads, eps=eps,
        downsample=downsample,
    )
