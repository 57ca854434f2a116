"""Model loading: GGUF workspaces -> device param pytrees.

Replaces the reference's model_loader.cpp:24-41 arch dispatch +
llama_weight.hpp mmap'd-gguf-tensor wiring. Tensor naming follows the
GGUF/llama.cpp convention the reference consumes (token_embd.weight,
blk.{i}.attn_q.weight, ...; reference llama_weight.hpp:23-53).

RoPE layout note: llama.cpp's HF->GGUF converter permutes Wq/Wk so that
adjacent-pair rotation (ggml mode NORM) matches HF's half-rotation; qwen2
weights are not permuted and use NEOX. We preserve that convention:
arch "llama" => rope_type NORM, arch "qwen2" => NEOX, and HF-direct
loading (tests) => NEOX.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.config import LLMConfig, ModelConfig, RopeConfig
from ..core.gguf import GGMLType, GGUFReader
from ..core.logging import get_logger
from ..core.quant import QK, QuantizedTensor, quantize, repack_gguf_tensor
from ..ops.elementwise import ROPE_TYPE_NEOX, ROPE_TYPE_NORM
from ..ops.qmatmul import QLinear
from .llama import LayerWeights, LlamaParams, QEmbedding

import jax

log = get_logger("loader")


def _stack_qlinears(parts: list[QLinear]) -> QLinear:
    """Stack same-shape QLinears on a new leading axis (MoE experts)."""
    import dataclasses

    head = parts[0]
    return dataclasses.replace(
        head,
        q=jnp.stack([p.q for p in parts]),
        scales=jnp.stack([p.scales for p in parts]),
        bias=None if head.bias is None
        else jnp.stack([p.bias for p in parts]))


def stack_layers(layers: list[LayerWeights]) -> LayerWeights:
    """Stack per-layer pytrees on a new leading axis (for lax.scan).
    Expert QLinears end up [L, E, ...] — forward() flattens a
    (layer, expert) view at trace time (free reshape) so the kernel's
    scalar-prefetch index layer * E + e addresses a slab, while the
    stored axis order stays shardable over an "ep" mesh axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def _concat_qlinear(parts: list[QLinear]) -> QLinear | None:
    """Concatenate QLinears along the output axis (same K/format)."""
    if any(p is None for p in parts):
        return None
    head = parts[0]
    for p in parts[1:]:
        if (p.packed != head.packed or p.unsigned != head.unsigned
                or p.pack_group != head.pack_group
                or p.scale_group != head.scale_group
                or p.in_features != head.in_features
                or (p.bias is None) != (head.bias is None)):
            return None
    import dataclasses

    return dataclasses.replace(
        head,
        q=jnp.concatenate([p.q for p in parts], axis=-1),
        scales=jnp.concatenate([p.scales for p in parts], axis=-1),
        bias=None if head.bias is None else jnp.concatenate(
            [p.bias for p in parts], axis=-1),
        out_features=sum(p.out_features for p in parts),
    )


def fuse_layer(lw: LayerWeights) -> LayerWeights:
    """Fuse QKV and gate/up projections into single matmuls (fewer,
    larger kernel launches; decode is launch-overhead sensitive).
    Fusions apply independently — MoE layers have no dense gate/up but
    still fuse QKV."""
    import dataclasses

    out = lw
    wqkv = _concat_qlinear([lw.wq, lw.wk, lw.wv])
    if wqkv is not None:
        bqkv = None
        if lw.bq is not None:
            bqkv = jnp.concatenate([lw.bq, lw.bk, lw.bv], axis=-1)
        out = dataclasses.replace(
            out, wqkv=wqkv, bqkv=bqkv,
            wq=None, wk=None, wv=None, bq=None, bk=None, bv=None)
    wgu = _concat_qlinear([lw.w_gate, lw.w_up])
    if wgu is not None:
        out = dataclasses.replace(out, wgu=wgu, w_gate=None, w_up=None)
    return out


# llama-family architectures sharing the same forward (QKV bias and
# rope style vary per-model; the reference's headline list maps to:
# llama / qwen2 (SmallThinker, Qwen-2.x) / internlm3 (InternLM-3) /
# DeepSeek-R1-Distill-Llama = llama)
LLAMA_FAMILY = {"llama", "qwen2", "qwen3", "qwen2moe", "qwen3moe",
                "internlm2", "internlm3", "smallthinker", "internvl"}


def apply_hf_rope_scaling(rope: RopeConfig, rope_scaling: dict | None,
                          max_pos: int | None = None) -> None:
    """Apply a HuggingFace `rope_scaling` config dict to a RopeConfig in
    place (same mapping as config_from_gguf_metadata's rope.scaling.*
    keys; reference carries these into ggml's YaRN rope,
    config.hpp:88-97)."""
    rs = rope_scaling or {}
    rs_type = rs.get("rope_type", rs.get("type", "none")) or "none"
    if rs_type in ("none", "default"):
        return
    factor = float(rs.get("factor", 1.0))
    rope.scaling_factor = factor
    rope.n_ctx_orig = int(rs.get("original_max_position_embeddings",
                                 max_pos or rope.n_ctx_orig))
    if rs_type == "llama3":
        rope.scaling_type = "llama3"
        rope.low_freq_factor = float(rs.get("low_freq_factor", 1.0))
        rope.high_freq_factor = float(rs.get("high_freq_factor", 4.0))
    elif rs_type == "linear":
        rope.freq_scale = 1.0 / factor if factor else 1.0
    elif rs_type == "yarn":
        rope.freq_scale = 1.0 / factor if factor else 1.0
        rope.ext_factor = 1.0
        if rs.get("attention_factor"):
            rope.attn_factor = float(rs["attention_factor"])
        rope.beta_fast = float(rs.get("beta_fast", 32.0))
        rope.beta_slow = float(rs.get("beta_slow", 1.0))
    else:
        raise ValueError(f"unsupported rope scaling type '{rs_type}'")


def config_from_gguf_metadata(md: dict[str, Any]) -> ModelConfig:
    """Mirror of the reference's gguf_config_to_json (tools/
    gguf_config_to_json/main.cpp): GGUF metadata -> ModelConfig."""
    arch = md.get("general.architecture", "llama")
    if arch not in LLAMA_FAMILY:
        raise ValueError(f"unsupported architecture '{arch}' "
                         f"(supported: {sorted(LLAMA_FAMILY)})")

    def key(suffix: str, default=None):
        return md.get(f"{arch}.{suffix}", default)

    dim = int(key("embedding_length", 2048))
    n_heads = int(key("attention.head_count", 32))
    n_kv = int(key("attention.head_count_kv", n_heads))
    # qwen3-style models decouple head_dim from dim/n_heads; llama.cpp
    # carries it as attention.key_length
    head_size = int(key("attention.key_length", dim // n_heads))
    rope_dims = int(key("rope.dimension_count", head_size))
    vocab = md.get("tokenizer.ggml.tokens")
    vocab_size = int(key("vocab_size", len(vocab) if vocab is not None else 32000))
    default_rope = (ROPE_TYPE_NEOX
                    if arch in ("qwen2", "qwen3", "qwen2moe", "qwen3moe",
                                "internvl", "internlm2", "internlm3")
                    else ROPE_TYPE_NORM)
    # rope scaling: llama.cpp-standard keys (rope.scaling.*, written by
    # gguf-py and by our convert_hf) — reference carries these into
    # ggml's YaRN rope (config.hpp:88-97, ggml.c:15319-15365)
    scaling_type = str(key("rope.scaling.type", "none") or "none")
    if scaling_type not in ("none", "linear", "yarn", "llama3"):
        raise ValueError(f"unsupported rope scaling type '{scaling_type}'")
    scaling_factor = float(key("rope.scaling.factor", 1.0) or 1.0)
    n_ctx_orig = int(key("rope.scaling.original_context_length",
                         key("context_length", 2048)))
    freq_scale = 1.0 / float(key("rope.scale_linear", 1.0) or 1.0)
    ext_factor = 0.0
    if scaling_type == "linear" and scaling_factor != 0:
        freq_scale = 1.0 / scaling_factor
    elif scaling_type == "yarn" and scaling_factor != 0:
        freq_scale = 1.0 / scaling_factor
        ext_factor = 1.0
    rope = RopeConfig(
        n_dims=rope_dims,
        n_ctx_orig=n_ctx_orig,
        freq_base=float(key("rope.freq_base", 10000.0)),
        freq_scale=freq_scale,
        ext_factor=ext_factor,
        attn_factor=float(key("rope.scaling.attn_factor", 1.0) or 1.0),
        beta_fast=float(key("rope.scaling.beta_fast", 32.0) or 32.0),
        beta_slow=float(key("rope.scaling.beta_slow", 1.0) or 1.0),
        # our own converter writes unpermuted HF weights and marks it
        rope_type=int(md.get("powerserve.rope_type", default_rope)),
        # linear/yarn fold into freq_scale/ext_factor above; only llama3
        # needs per-dim frequency factors at angle-computation time
        scaling_type="llama3" if scaling_type == "llama3" else "none",
        scaling_factor=scaling_factor,
        low_freq_factor=float(key("rope.scaling.low_freq_factor", 1.0) or 1.0),
        high_freq_factor=float(key("rope.scaling.high_freq_factor", 4.0)
                               or 4.0),
    )
    n_experts = int(key("expert_count", 0) or 0)
    # MoE: hidden_dim is the EXPERT ffn width (qwen3moe carries it as
    # expert_feed_forward_length; mixtral-as-llama reuses
    # feed_forward_length)
    ffn_len = int(key("expert_feed_forward_length", 0) or 0) if n_experts \
        else 0
    llm = LLMConfig(
        dim=dim,
        hidden_dim=ffn_len or int(key("feed_forward_length", 4 * dim)),
        n_experts=n_experts,
        n_experts_used=int(key("expert_used_count", 0) or 0),
        n_layers=int(key("block_count", 16)),
        n_heads=n_heads,
        n_kv_heads=n_kv,
        head_size=head_size,
        seq_len=int(key("context_length", 2048)),
        vocab_size=vocab_size,
        kv_dim=n_kv * head_size,
        rope=rope,
        norm_eps=float(key("attention.layer_norm_rms_epsilon", 1e-5)),
    )
    return ModelConfig(arch=arch, llm=llm)


def _qlinear_from_gguf(reader: GGUFReader, name: str,
                       pack: bool = True, mxu: bool = False) -> QLinear:
    info = reader.tensors[name]
    if mxu:
        qt = repack_gguf_tensor(reader.tensor_raw(name), info.ggml_type,
                                info.shape)
        if qt.k % 128 == 0:
            return QLinear.from_quantized(qt, mxu=True)
        return QLinear.from_quantized(qt, pack=pack)
    if pack:
        from ..core.native import native_repack

        n_out, k_in = info.shape
        nat = native_repack(reader.tensor_raw(name), info.ggml_type,
                            n_out, k_in)
        if nat is not None:
            q, scales, bias, group, unsigned = nat
            return QLinear(
                q=jnp.asarray(q), scales=jnp.asarray(scales),
                bias=None if bias is None else jnp.asarray(bias),
                packed=group > 0, unsigned=unsigned,
                in_features=k_in, out_features=n_out, pack_group=group)
    qt = repack_gguf_tensor(reader.tensor_raw(name), info.ggml_type,
                            info.shape)
    return QLinear.from_quantized(qt, pack=pack)


def _qlinear_experts(reader: GGUFReader, name: str,
                     pack: bool = True) -> QLinear:
    """3-D expert tensor [E, N_out, K_in] -> stacked QLinear (leading
    expert axis). ggml stores experts contiguously (slowest dim), so
    the payload splits into E equal per-expert 2-D payloads."""
    info = reader.tensors[name]
    E = info.shape[0]
    raw = reader.tensor_raw(name)
    per = raw.size // E
    parts = []
    for e in range(E):
        qt = repack_gguf_tensor(raw[e * per:(e + 1) * per],
                                info.ggml_type, tuple(info.shape[1:]))
        parts.append(QLinear.from_quantized(qt, pack=pack))
    return _stack_qlinears(parts)


def _embedding_from_gguf(reader: GGUFReader, name: str) -> QEmbedding:
    info = reader.tensors[name]
    qt = repack_gguf_tensor(reader.tensor_raw(name), info.ggml_type,
                            info.shape)
    # repack gives [K=dim, N=vocab]; embedding wants row-major [V, D]
    return QEmbedding(
        q=jnp.asarray(qt.q.T.copy()),
        scales=jnp.asarray(qt.scales.T.copy()),
        bias=None if qt.bias is None else jnp.asarray(qt.bias.T.copy()),
    )


def _lm_head_from_embedding(emb: QEmbedding) -> QLinear:
    """Tied embeddings: reuse the embedding table as output projection
    (reference lm_head matmul with token_embd when output.weight absent)."""
    q = jnp.swapaxes(emb.q, 0, 1)  # [D, V]
    scales = jnp.swapaxes(emb.scales, 0, 1)  # [D//32, V]
    bias = None if emb.bias is None else jnp.swapaxes(emb.bias, 0, 1)
    return QLinear(q=q, scales=scales, bias=bias, packed=False,
                   unsigned=False, in_features=q.shape[0],
                   out_features=q.shape[1])


def _norm_from_gguf(reader: GGUFReader, name: str) -> jnp.ndarray:
    return jnp.asarray(reader.tensor_float(name).astype(np.float32))


def _maybe_bias(reader: GGUFReader, name: str) -> jnp.ndarray | None:
    if name in reader.tensors:
        return jnp.asarray(reader.tensor_float(name).astype(np.float32))
    return None


def load_gguf_model(path: str | os.PathLike, pack: bool = True,
                    stacked: bool = True, fuse: bool = True,
                    mxu: bool | None = None) -> tuple[ModelConfig, LlamaParams]:
    """Load weights.gguf (or a model dir containing it).

    stacked=True (default) stacks per-layer weights for the lax.scan
    forward whose Pallas kernels index layers via scalar prefetch (small
    compiles, no slice copies); stacked=False keeps a tuple for the
    unrolled forward.

    mxu=True requantizes weights at load to the MXU-native W8 format
    (symmetric int8, per-128 scales — see ops/qmatmul.py W8 kernel);
    default comes from POWERSERVE_WEIGHT_FORMAT=w8|gguf (gguf)."""
    if mxu is None:
        mxu = os.environ.get("POWERSERVE_WEIGHT_FORMAT", "gguf") == "w8"
    p = Path(path)
    if p.is_dir():
        # workspace-persisted autotune table (tools/autotune.py) seeds
        # the kernel's per-shape knob overrides for this model
        from ..ops.qmatmul import load_tune_table

        n_tuned = load_tune_table(p / "qmm_tune.json")
        if n_tuned:
            log.info(f"loaded {n_tuned} autotuned kernel shapes")
        p = p / "weights.gguf"
    reader = GGUFReader(p)
    cfg = config_from_gguf_metadata(reader.metadata)
    L = cfg.llm.n_layers

    embed = _embedding_from_gguf(reader, "token_embd.weight")
    layers = []
    for i in range(L):
        pre = f"blk.{i}."
        if pre + "ffn_gate_exps.weight" in reader.tensors:
            # MoE FFN (mixtral-as-llama / qwen3moe): router + stacked
            # expert projections — the reference cannot load these
            router = reader.tensor_float(pre + "ffn_gate_inp.weight")
            ffn_kw = dict(
                router=jnp.asarray(router.T.copy().astype(np.float32)),
                w_gate_exps=_qlinear_experts(
                    reader, pre + "ffn_gate_exps.weight", pack),
                w_up_exps=_qlinear_experts(
                    reader, pre + "ffn_up_exps.weight", pack),
                w_down_exps=_qlinear_experts(
                    reader, pre + "ffn_down_exps.weight", pack),
                w_gate=None, w_up=None, w_down=None)
        else:
            ffn_kw = dict(
                w_gate=_qlinear_from_gguf(
                    reader, pre + "ffn_gate.weight", pack, mxu),
                w_up=_qlinear_from_gguf(
                    reader, pre + "ffn_up.weight", pack, mxu),
                w_down=_qlinear_from_gguf(
                    reader, pre + "ffn_down.weight", pack, mxu))
        layers.append(LayerWeights(
            attn_norm=_norm_from_gguf(reader, pre + "attn_norm.weight"),
            ffn_norm=_norm_from_gguf(reader, pre + "ffn_norm.weight"),
            wq=_qlinear_from_gguf(reader, pre + "attn_q.weight", pack, mxu),
            wk=_qlinear_from_gguf(reader, pre + "attn_k.weight", pack, mxu),
            wv=_qlinear_from_gguf(reader, pre + "attn_v.weight", pack, mxu),
            wo=_qlinear_from_gguf(reader, pre + "attn_output.weight", pack, mxu),
            q_norm=_maybe_bias(reader, pre + "attn_q_norm.weight"),
            k_norm=_maybe_bias(reader, pre + "attn_k_norm.weight"),
            bq=_maybe_bias(reader, pre + "attn_q.bias"),
            bk=_maybe_bias(reader, pre + "attn_k.bias"),
            bv=_maybe_bias(reader, pre + "attn_v.bias"),
            **ffn_kw,
        ))
    out_norm = _norm_from_gguf(reader, "output_norm.weight")
    if "output.weight" in reader.tensors:
        lm_head = _qlinear_from_gguf(reader, "output.weight", pack, mxu)
        cfg.llm.tie_embeddings = False
    else:
        lm_head = _lm_head_from_embedding(embed)
        cfg.llm.tie_embeddings = True
    if fuse:
        layers = [fuse_layer(lw) for lw in layers]
    params = LlamaParams(
        embed=embed,
        layers=stack_layers(layers) if stacked else tuple(layers),
        out_norm=out_norm, lm_head=lm_head)
    reader.close()
    return cfg, params


# ---------------------------------------------------------------------------
# HF / numpy direct loading (tests + converters)
# ---------------------------------------------------------------------------

def _qlinear_from_float(w_out_in: np.ndarray, fmt: int,
                        pack: bool = True) -> QLinear:
    """w: [out, in] float (HF layout) -> QLinear with K=in, N=out."""
    payload = quantize(w_out_in, fmt)
    qt = repack_gguf_tensor(payload, fmt, w_out_in.shape)
    return QLinear.from_quantized(qt, pack=pack)


def _embedding_from_float(w: np.ndarray, fmt: int) -> QEmbedding:
    payload = quantize(w, fmt)  # blocks along dim within each row
    qt = repack_gguf_tensor(payload, fmt, w.shape)  # [D, V]
    return QEmbedding(
        q=jnp.asarray(qt.q.T.copy()),
        scales=jnp.asarray(qt.scales.T.copy()),
        bias=None if qt.bias is None else jnp.asarray(qt.bias.T.copy()),
    )


def params_from_hf_state_dict(sd: dict[str, np.ndarray], cfg: ModelConfig,
                              fmt: int = GGMLType.Q8_0, pack: bool = True,
                              stacked: bool = True,
                              fuse: bool = False) -> LlamaParams:
    """Build params from a HuggingFace Llama/Qwen2 state dict (numpy
    arrays, HF names). Used by tests (golden logits vs transformers) and
    the HF->workspace converter. HF layout => NEOX rope."""
    cfg.llm.rope.rope_type = ROPE_TYPE_NEOX
    L = cfg.llm.n_layers

    def get(name):
        return np.asarray(sd[name], dtype=np.float32)

    embed = _embedding_from_float(get("model.embed_tokens.weight"), fmt)
    layers = []
    for i in range(L):
        pre = f"model.layers.{i}."

        def b(name):
            full = pre + name
            return jnp.asarray(get(full)) if full in sd else None

        # MoE layers: HF Mixtral (block_sparse_moe.gate + experts.j.w1/
        # w2/w3) or Qwen3-MoE (mlp.gate + mlp.experts.j.*_proj)
        moe_kw: dict = {}
        dense_kw: dict = {}
        if pre + "block_sparse_moe.gate.weight" in sd:
            gate_w = get(pre + "block_sparse_moe.gate.weight")  # [E, dim]
            names = [(f"block_sparse_moe.experts.{j}.w1.weight",
                      f"block_sparse_moe.experts.{j}.w3.weight",
                      f"block_sparse_moe.experts.{j}.w2.weight")
                     for j in range(gate_w.shape[0])]
        elif pre + "mlp.gate.weight" in sd:
            gate_w = get(pre + "mlp.gate.weight")
            names = [(f"mlp.experts.{j}.gate_proj.weight",
                      f"mlp.experts.{j}.up_proj.weight",
                      f"mlp.experts.{j}.down_proj.weight")
                     for j in range(gate_w.shape[0])]
        else:
            gate_w = None
        if gate_w is not None:
            gs, us, ds = [], [], []
            for gn, un, dn in names:
                gs.append(_qlinear_from_float(get(pre + gn), fmt, pack))
                us.append(_qlinear_from_float(get(pre + un), fmt, pack))
                ds.append(_qlinear_from_float(get(pre + dn), fmt, pack))
            moe_kw = dict(router=jnp.asarray(gate_w.T.copy()),
                          w_gate_exps=_stack_qlinears(gs),
                          w_up_exps=_stack_qlinears(us),
                          w_down_exps=_stack_qlinears(ds),
                          w_gate=None, w_up=None, w_down=None)
        else:
            dense_kw = dict(
                w_gate=_qlinear_from_float(
                    get(pre + "mlp.gate_proj.weight"), fmt, pack),
                w_up=_qlinear_from_float(
                    get(pre + "mlp.up_proj.weight"), fmt, pack),
                w_down=_qlinear_from_float(
                    get(pre + "mlp.down_proj.weight"), fmt, pack),
            )
        layers.append(LayerWeights(
            attn_norm=jnp.asarray(get(pre + "input_layernorm.weight")),
            ffn_norm=jnp.asarray(get(pre + "post_attention_layernorm.weight")),
            wq=_qlinear_from_float(get(pre + "self_attn.q_proj.weight"), fmt, pack),
            wk=_qlinear_from_float(get(pre + "self_attn.k_proj.weight"), fmt, pack),
            wv=_qlinear_from_float(get(pre + "self_attn.v_proj.weight"), fmt, pack),
            wo=_qlinear_from_float(get(pre + "self_attn.o_proj.weight"), fmt, pack),
            bq=b("self_attn.q_proj.bias"),
            bk=b("self_attn.k_proj.bias"),
            bv=b("self_attn.v_proj.bias"),
            q_norm=b("self_attn.q_norm.weight"),
            k_norm=b("self_attn.k_norm.weight"),
            **dense_kw, **moe_kw,
        ))
    out_norm = jnp.asarray(get("model.norm.weight"))
    if fuse:
        layers = [fuse_layer(lw) for lw in layers]
    if "lm_head.weight" in sd:
        lm_head = _qlinear_from_float(get("lm_head.weight"), fmt, pack)
    else:
        lm_head = _lm_head_from_embedding(embed)
    return LlamaParams(
        embed=embed,
        layers=stack_layers(layers) if stacked else tuple(layers),
        out_norm=out_norm, lm_head=lm_head)


# ---------------------------------------------------------------------------
# EAGLE draft heads (speculative/eagle.py)
# ---------------------------------------------------------------------------


def load_eagle_gguf(path: str | os.PathLike, target_params: LlamaParams,
                    target_llm: LLMConfig, pack: bool = True):
    """Load an EAGLE head GGUF (tools/convert_hf.py::convert_eagle,
    general.architecture == "eagle") against its target model.

    The head shares the target's embedding and lm_head unless the file
    carries its own token_embd / output tensors; blk.0 without an
    attn_norm tensor means EAGLE-1 identity input-norm semantics.
    Returns (e_llm: LLMConfig, EagleParams).
    """
    import dataclasses

    from ..speculative.eagle import EagleParams

    p = Path(path)
    if p.is_dir():
        p = p / "weights.gguf"
    reader = GGUFReader(p)
    md = reader.metadata
    if md.get("general.architecture") != "eagle":
        raise ValueError(f"{p}: not an eagle head "
                         f"(arch={md.get('general.architecture')})")
    L = int(md.get("eagle.block_count", 1))
    dim = int(md.get("eagle.embedding_length", target_llm.dim))
    n_heads = int(md.get("eagle.attention.head_count", target_llm.n_heads))
    n_kv = int(md.get("eagle.attention.head_count_kv",
                      target_llm.n_kv_heads))
    head_dim = int(md.get("eagle.rope.dimension_count",
                          dim // max(n_heads, 1)))
    rope = dataclasses.replace(
        target_llm.rope,
        freq_base=float(md.get("eagle.rope.freq_base",
                               target_llm.rope.freq_base)),
        rope_type=int(md.get("powerserve.rope_type",
                             target_llm.rope.rope_type)),
        n_dims=head_dim)
    e_llm = dataclasses.replace(
        target_llm, n_layers=L, dim=dim, n_heads=n_heads, n_kv_heads=n_kv,
        head_size=head_dim, kv_dim=n_kv * head_dim, rope=rope,
        hidden_dim=int(md.get("eagle.feed_forward_length",
                              target_llm.hidden_dim)),
        norm_eps=float(md.get("eagle.attention.layer_norm_rms_epsilon",
                              target_llm.norm_eps)))

    layers = []
    input_norm = "blk.0.attn_norm.weight" in reader.tensors
    for i in range(L):
        pre = f"blk.{i}."
        if pre + "attn_norm.weight" in reader.tensors:
            attn_norm = _norm_from_gguf(reader, pre + "attn_norm.weight")
        else:
            attn_norm = jnp.ones(dim, jnp.float32)  # unused at i==0
        layers.append(LayerWeights(
            attn_norm=attn_norm,
            ffn_norm=_norm_from_gguf(reader, pre + "ffn_norm.weight"),
            wq=_qlinear_from_gguf(reader, pre + "attn_q.weight", pack),
            wk=_qlinear_from_gguf(reader, pre + "attn_k.weight", pack),
            wv=_qlinear_from_gguf(reader, pre + "attn_v.weight", pack),
            wo=_qlinear_from_gguf(reader, pre + "attn_output.weight", pack),
            bq=_maybe_bias(reader, pre + "attn_q.bias"),
            bk=_maybe_bias(reader, pre + "attn_k.bias"),
            bv=_maybe_bias(reader, pre + "attn_v.bias"),
            w_gate=_qlinear_from_gguf(reader, pre + "ffn_gate.weight", pack),
            w_up=_qlinear_from_gguf(reader, pre + "ffn_up.weight", pack),
            w_down=_qlinear_from_gguf(reader, pre + "ffn_down.weight", pack),
        ))
    fc = _qlinear_from_gguf(reader, "fc.weight", pack)
    fc_bias = _maybe_bias(reader, "fc.bias")
    embed = (_embedding_from_gguf(reader, "token_embd.weight")
             if "token_embd.weight" in reader.tensors
             else target_params.embed)
    if "output.weight" in reader.tensors:
        lm_head = _qlinear_from_gguf(reader, "output.weight", pack)
    else:
        lm_head = target_params.lm_head
    out_norm = (_norm_from_gguf(reader, "output_norm.weight")
                if "output_norm.weight" in reader.tensors else None)
    reader.close()
    return e_llm, EagleParams(
        fc=fc, fc_bias=fc_bias, layers=tuple(layers), embed=embed,
        lm_head=lm_head, out_norm=out_norm, input_norm=input_norm)
