"""Device-native random parameter builder for benchmarks.

Creates quantized LlamaParams directly on the accelerator with jax PRNG
— no host->device weight transfer, so an 8B-parameter benchmark model
materializes in seconds. The whole pytree is produced by ONE jitted
program (layers vmapped over per-layer keys) so remote-TPU links pay a
single compile/dispatch instead of hundreds. Values are random; kernel
timing is identical to real weights."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig, ModelConfig, RopeConfig
from ..models.llama import LayerWeights, LlamaParams, QEmbedding
from ..ops.elementwise import ROPE_TYPE_NORM
from ..ops.qmatmul import QLinear
from .synthetic import PRESETS


def _rand_qlinear(key, k: int, n: int, quant: str) -> QLinear:
    from ..core.quant import MXU_GROUP, choose_pack_group

    k1, k2, k3 = jax.random.split(key, 3)
    kb = k // 32
    if quant == "w8":  # MXU-native int8 format (per-128 scales)
        q = jax.random.bits(k1, (k, n), jnp.uint8).astype(jnp.int8)
        s = (jax.random.uniform(k2, (k // MXU_GROUP, n), jnp.float32)
             * 0.02 + 0.001)
        return QLinear(q=q, scales=s, bias=None, packed=False,
                       unsigned=False, in_features=k, out_features=n,
                       scale_group=MXU_GROUP)
    scales = (jax.random.uniform(k2, (kb, n), jnp.float32) * 0.02 + 0.001
              ).astype(jnp.bfloat16)
    if quant in ("q4_0", "q4_k"):
        q = jax.random.bits(k1, (k // 2, n), jnp.uint8)
        bias = None
        if quant == "q4_k":
            bias = (jax.random.uniform(k3, (kb, n), jnp.float32) * 0.01
                    ).astype(jnp.bfloat16)
        return QLinear(q=q, scales=scales, bias=bias, packed=True,
                       unsigned=(quant == "q4_k"), in_features=k,
                       out_features=n, pack_group=choose_pack_group(k))
    q = jax.random.bits(k1, (k, n), jnp.uint8).astype(jnp.int8)
    return QLinear(q=q, scales=scales, bias=None, packed=False,
                   unsigned=False, in_features=k, out_features=n)


def make_device_params(preset: str = "llama-8b", quant: str = "q4_k",
                       seed: int = 0,
                       stacked: bool = True) -> tuple[ModelConfig, LlamaParams]:
    """stacked=True (default) builds lax.scan layout (Pallas indexes
    layers via scalar prefetch); stacked=False builds a tuple for the
    unrolled forward."""
    p = PRESETS[preset]
    dim, ffn, L = p["dim"], p["ffn"], p["layers"]
    H, Hkv, V = p["heads"], p["kv_heads"], p["vocab"]
    E = int(p.get("experts", 0))
    hd = dim // H
    Vpad = (V + 255) // 256 * 256

    def one_layer(key) -> LayerWeights:
        ks = jax.random.split(key, 8)
        if E:
            # MoE FFN: router + vmapped expert slabs ([E, ...] per
            # layer -> [L, E, ...] after the layer vmap, the loader's
            # layout)
            ffn_kw = dict(
                w_down=None, wgu=None,
                router=jax.random.uniform(ks[7], (dim, E), jnp.float32,
                                          -0.05, 0.05),
                w_gate_exps=jax.vmap(
                    lambda k: _rand_qlinear(k, dim, ffn, quant))(
                        jax.random.split(ks[4], E)),
                w_up_exps=jax.vmap(
                    lambda k: _rand_qlinear(k, dim, ffn, quant))(
                        jax.random.split(ks[5], E)),
                w_down_exps=jax.vmap(
                    lambda k: _rand_qlinear(k, ffn, dim, quant))(
                        jax.random.split(ks[6], E)),
            )
        else:
            ffn_kw = dict(
                w_down=_rand_qlinear(ks[6], ffn, dim, quant),
                wgu=_rand_qlinear(ks[4], dim, 2 * ffn, quant),
            )
        return LayerWeights(
            attn_norm=jnp.ones(dim, jnp.float32),
            ffn_norm=jnp.ones(dim, jnp.float32),
            wq=None, wk=None, wv=None,
            wo=_rand_qlinear(ks[3], H * hd, dim, quant),
            bq=None, bk=None, bv=None,
            w_gate=None, w_up=None,
            wqkv=_rand_qlinear(ks[0], dim, (H + 2 * Hkv) * hd, quant),
            bqkv=None,
            **ffn_kw,
        )

    @jax.jit
    def build(key) -> LlamaParams:
        k_emb, k_head, k_layers = jax.random.split(key, 3)
        embed = QEmbedding(
            q=jax.random.bits(k_emb, (Vpad, dim), jnp.uint8).astype(jnp.int8),
            scales=(jax.random.uniform(k_emb, (Vpad, dim // 32)) * 0.02
                    ).astype(jnp.float32),
            bias=None,
        )
        if stacked:
            layers = jax.vmap(one_layer)(jax.random.split(k_layers, L))
        else:
            layers = tuple(one_layer(k)
                           for k in jax.random.split(k_layers, L))
        return LlamaParams(
            embed=embed,
            layers=layers,
            out_norm=jnp.ones(dim, jnp.float32),
            lm_head=_rand_qlinear(k_head, dim, Vpad, quant),
        )

    params = build(jax.random.PRNGKey(seed))
    rope = RopeConfig(n_dims=hd, freq_base=500000.0, rope_type=ROPE_TYPE_NORM)
    llm = LLMConfig(dim=dim, hidden_dim=ffn, n_layers=L, n_heads=H,
                    n_kv_heads=Hkv, head_size=hd, seq_len=2048,
                    vocab_size=Vpad, kv_dim=Hkv * hd, rope=rope,
                    n_experts=E,
                    n_experts_used=int(p.get("experts_used", 2)))
    return ModelConfig(arch=p["arch"], llm=llm), params
