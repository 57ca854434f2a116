"""Golden-logit tests: our jitted forward vs HuggingFace transformers
Llama/Qwen2 on random tiny models (the reference validates numerics
against its converter's PyTorch model via cos-sim dumps, SURVEY §4;
we assert directly on logits)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from powerserve_tpu.core.config import ModelConfig
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.kv import KVCache
from powerserve_tpu.models import forward, params_from_hf_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _mk_hf_llama(qwen=False, vocab=256, dim=64, layers=2, heads=4, kv_heads=2,
                 ffn=128, seq=128):
    if qwen:
        hf_cfg = transformers.Qwen2Config(
            vocab_size=vocab, hidden_size=dim, intermediate_size=ffn,
            num_hidden_layers=layers, num_attention_heads=heads,
            num_key_value_heads=kv_heads, max_position_embeddings=seq,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        )
        model = transformers.Qwen2ForCausalLM(hf_cfg)
    else:
        hf_cfg = transformers.LlamaConfig(
            vocab_size=vocab, hidden_size=dim, intermediate_size=ffn,
            num_hidden_layers=layers, num_attention_heads=heads,
            num_key_value_heads=kv_heads, max_position_embeddings=seq,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        )
        model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig(arch="qwen2" if qwen else "llama")
    cfg.llm.dim = dim
    cfg.llm.hidden_dim = ffn
    cfg.llm.n_layers = layers
    cfg.llm.n_heads = heads
    cfg.llm.n_kv_heads = kv_heads
    cfg.llm.head_size = dim // heads
    cfg.llm.seq_len = seq
    cfg.llm.vocab_size = vocab
    cfg.llm.kv_dim = kv_heads * (dim // heads)
    cfg.llm.rope.n_dims = dim // heads
    cfg.llm.rope.freq_base = 10000.0
    cfg.llm.norm_eps = 1e-5
    return model, cfg


def _to_sd(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def test_qwen3_qk_norm_logits_match_hf():
    """qwen3 = qwen2-family + per-head QK RMS norm before RoPE; golden
    logits vs transformers Qwen3ForCausalLM (no QKV biases, explicit
    head_dim)."""
    torch.manual_seed(0)
    dim, heads, kv_heads, hd = 64, 4, 2, 16
    hf_cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=dim, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=hd,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False)
    model = transformers.Qwen3ForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig(arch="qwen3")
    cfg.llm.dim = dim
    cfg.llm.hidden_dim = 128
    cfg.llm.n_layers = 2
    cfg.llm.n_heads = heads
    cfg.llm.n_kv_heads = kv_heads
    cfg.llm.head_size = hd
    cfg.llm.seq_len = 128
    cfg.llm.vocab_size = 256
    cfg.llm.kv_dim = kv_heads * hd
    cfg.llm.rope.n_dims = hd
    cfg.llm.rope.freq_base = 10000.0
    cfg.llm.norm_eps = 1e-5
    params = params_from_hf_state_dict(_to_sd(model), cfg, fmt=GGMLType.Q8_0)
    assert params.layers.q_norm is not None  # stacked [L, hd]

    T = 10
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, (1, T))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()[0]
    kv = KVCache.create(2, 1, 32, kv_heads, hd, dtype="bf16")
    logits, _ = forward(params, cfg.llm, kv, jnp.asarray(tokens),
                        jnp.arange(T)[None, :], backend="xla",
                        logits_mode="all")
    got = np.asarray(logits)[0]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.08, f"logits rel err {rel}"
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"logits correlation {corr}"


@pytest.mark.parametrize("qwen", [False, True])
def test_prefill_logits_match_hf(qwen):
    torch.manual_seed(0)
    model, cfg = _mk_hf_llama(qwen=qwen)
    params = params_from_hf_state_dict(_to_sd(model), cfg, fmt=GGMLType.Q8_0)

    T = 10
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.llm.vocab_size, (1, T))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()[0]  # [T, V]

    kv = KVCache.create(cfg.llm.n_layers, 1, 32, cfg.llm.n_kv_heads,
                        cfg.llm.head_size, dtype="bf16")
    positions = jnp.arange(T)[None, :]
    logits, kv = forward(params, cfg.llm, kv, jnp.asarray(tokens), positions,
                         backend="xla", logits_mode="all")
    got = np.asarray(logits)[0]
    # Q8 weights + bf16 matmuls: loose numeric tolerance, but argmax must agree
    denom = np.abs(ref).max()
    rel = np.abs(got - ref).max() / denom
    assert rel < 0.08, f"logits rel err {rel}"
    # random tiny-model logits are near-uniform, so argmax is brittle;
    # correlation is the robust structural check
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"logits correlation {corr}"


def test_incremental_decode_matches_prefill():
    """Decoding token-by-token through the KV cache must equal one-shot
    prefill (ring-cache correctness)."""
    torch.manual_seed(1)
    model, cfg = _mk_hf_llama()
    params = params_from_hf_state_dict(_to_sd(model), cfg, fmt=GGMLType.Q8_0)
    T = 8
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.llm.vocab_size, (1, T))

    kv1 = KVCache.create(cfg.llm.n_layers, 1, 32, cfg.llm.n_kv_heads,
                         cfg.llm.head_size, dtype="bf16")
    logits_all, _ = forward(params, cfg.llm, kv1, jnp.asarray(tokens),
                            jnp.arange(T)[None, :], backend="xla",
                            logits_mode="all")
    ref_last = np.asarray(logits_all)[0, -1]

    kv2 = KVCache.create(cfg.llm.n_layers, 1, 32, cfg.llm.n_kv_heads,
                         cfg.llm.head_size, dtype="bf16")
    for t in range(T):
        logits, kv2 = forward(params, cfg.llm, kv2,
                              jnp.asarray(tokens[:, t:t + 1]),
                              jnp.full((1, 1), t), backend="xla",
                              logits_mode="last")
    got = np.asarray(logits)[0]
    np.testing.assert_allclose(got, ref_last, rtol=0.05, atol=0.05 * np.abs(ref_last).max())
    assert int(np.asarray(kv2.pos)[0]) == T


def test_int8_kv_close_to_bf16():
    torch.manual_seed(2)
    model, cfg = _mk_hf_llama()
    params = params_from_hf_state_dict(_to_sd(model), cfg, fmt=GGMLType.Q8_0)
    T = 8
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.llm.vocab_size, (1, T)))
    pos = jnp.arange(T)[None, :]
    outs = {}
    for dt in ("bf16", "int8"):
        kv = KVCache.create(cfg.llm.n_layers, 1, 32, cfg.llm.n_kv_heads,
                            cfg.llm.head_size, dtype=dt)
        logits, _ = forward(params, cfg.llm, kv, tokens, pos, backend="xla",
                            logits_mode="last")
        outs[dt] = np.asarray(logits)
    rel = np.abs(outs["int8"] - outs["bf16"]).max() / np.abs(outs["bf16"]).max()
    assert rel < 0.05, f"int8 KV deviates {rel}"


def test_forward_jits_and_caches():
    torch.manual_seed(3)
    model, cfg = _mk_hf_llama(layers=1)
    params = params_from_hf_state_dict(_to_sd(model), cfg, fmt=GGMLType.Q8_0)
    kv = KVCache.create(cfg.llm.n_layers, 2, 16, cfg.llm.n_kv_heads,
                        cfg.llm.head_size)
    step = jax.jit(lambda p, k, t, pos: forward(p, cfg.llm, k, t, pos,
                                                backend="xla"),
                   donate_argnums=(1,))
    t = jnp.zeros((2, 1), jnp.int32)
    logits, kv = step(params, kv, t, jnp.zeros((2, 1), jnp.int32))
    logits2, kv = step(params, kv, t + 1, jnp.ones((2, 1), jnp.int32))
    assert logits.shape == (2, cfg.llm.vocab_size)
    assert np.asarray(kv.pos).tolist() == [2, 2]


def test_unrolled_matches_scan():
    """Unrolled (tuple) layer layout must produce identical logits to
    the stacked lax.scan layout."""
    torch.manual_seed(5)
    model, cfg = _mk_hf_llama()
    sd = _to_sd(model)
    p_scan = params_from_hf_state_dict(sd, cfg, fmt=GGMLType.Q8_0,
                                       stacked=True)
    p_unroll = params_from_hf_state_dict(sd, cfg, fmt=GGMLType.Q8_0,
                                         stacked=False)
    assert isinstance(p_unroll.layers, tuple)
    T = 6
    tokens = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg.llm.vocab_size, (1, T)))
    pos = jnp.arange(T)[None, :]
    outs = []
    for p in (p_scan, p_unroll):
        kv = KVCache.create(cfg.llm.n_layers, 1, 16, cfg.llm.n_kv_heads,
                            cfg.llm.head_size, dtype="bf16")
        logits, kv2 = forward(p, cfg.llm, kv, tokens, pos, backend="xla",
                              logits_mode="all")
        outs.append((np.asarray(logits), np.asarray(kv2.k),
                     np.asarray(kv2.pos)))
    # bf16 matmuls fuse differently between the two lowerings — allow
    # rounding-level drift but require structural agreement
    corr = np.corrcoef(outs[0][0].ravel(), outs[1][0].ravel())[0, 1]
    assert corr > 0.9999, f"corr {corr}"
    denom = np.abs(outs[0][0]).max()
    assert np.abs(outs[0][0] - outs[1][0]).max() / denom < 0.02
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-2, atol=1e-2)
    np.testing.assert_array_equal(outs[0][2], outs[1][2])


def test_fused_matches_unfused():
    """fuse_layer (QKV + gate/up concat) must not change logits."""
    from powerserve_tpu.models.loader import fuse_layer, stack_layers

    torch.manual_seed(7)
    model, cfg = _mk_hf_llama(qwen=True)  # qwen: exercises fused bias
    sd = _to_sd(model)
    p_plain = params_from_hf_state_dict(sd, cfg, fmt=GGMLType.Q8_0,
                                        stacked=False)
    import dataclasses
    p_fused = dataclasses.replace(
        p_plain, layers=tuple(fuse_layer(lw) for lw in p_plain.layers))
    assert p_fused.layers[0].wqkv is not None
    assert p_fused.layers[0].bqkv is not None
    T = 6
    tokens = jnp.asarray(np.random.default_rng(7).integers(
        0, cfg.llm.vocab_size, (1, T)))
    pos = jnp.arange(T)[None, :]
    outs = []
    for p in (p_plain, p_fused):
        kv = KVCache.create(cfg.llm.n_layers, 1, 16, cfg.llm.n_kv_heads,
                            cfg.llm.head_size, dtype="bf16")
        logits, _ = forward(p, cfg.llm, kv, tokens, pos, backend="xla",
                            logits_mode="all")
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-2, atol=2e-2)
    corr = np.corrcoef(outs[0].ravel(), outs[1].ravel())[0, 1]
    assert corr > 0.9999


def _mk_hf_llama_scaled(rope_scaling, seq=1024, orig_ctx=64):
    """Tiny llama whose rope_scaling kicks in for positions > orig_ctx."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=seq, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, rope_scaling=rope_scaling,
    )
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig(arch="llama")
    llm = cfg.llm
    llm.dim, llm.hidden_dim, llm.n_layers = 64, 128, 2
    llm.n_heads, llm.n_kv_heads, llm.head_size = 4, 2, 16
    llm.seq_len, llm.vocab_size, llm.kv_dim = seq, 256, 32
    llm.norm_eps = 1e-5
    llm.rope.n_dims = 16
    llm.rope.freq_base = 10000.0
    from powerserve_tpu.models.loader import apply_hf_rope_scaling
    apply_hf_rope_scaling(llm.rope, rope_scaling, seq)
    return model, cfg


@pytest.mark.parametrize("rope_scaling", [
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
    {"rope_type": "yarn", "factor": 4.0,
     "original_max_position_embeddings": 64},
    {"rope_type": "linear", "factor": 4.0},
], ids=["llama3", "yarn", "linear"])
def test_rope_scaling_matches_hf_beyond_orig_ctx(rope_scaling):
    """VERDICT r1 item 2: logits at positions past n_ctx_orig must match
    transformers when llama3/yarn/linear rope_scaling is configured
    (Llama-3.1 — the benchmark flagship — uses llama3 scaling)."""
    torch.manual_seed(3)
    model, cfg = _mk_hf_llama_scaled(rope_scaling)

    T, start = 8, 200  # well past n_ctx_orig=64
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.llm.vocab_size, (1, start + T))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()[0, start:]

    kv = KVCache.create(cfg.llm.n_layers, 1, 256, cfg.llm.n_kv_heads,
                        cfg.llm.head_size, dtype="bf16")
    positions = jnp.arange(start + T)[None, :]
    logits, kv = forward(params_from_hf_state_dict(_to_sd(model), cfg,
                                                   fmt=GGMLType.Q8_0),
                         cfg.llm, kv, jnp.asarray(tokens), positions,
                         backend="xla", logits_mode="all")
    got = np.asarray(logits)[0, start:]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.08, f"logits rel err {rel}"
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"logits correlation {corr}"


def test_mixtral_moe_logits_match_hf():
    """MoE golden test: our router (softmax -> top-k -> renormalize) +
    expert-scan FFN vs transformers MixtralForCausalLM. The reference
    cannot load MoE GGUFs at all — this family is net-new."""
    torch.manual_seed(0)
    dim, heads, kv_heads, ffn, E, k = 64, 4, 2, 96, 4, 2
    hf_cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=dim, intermediate_size=ffn,
        num_hidden_layers=2, num_attention_heads=heads,
        num_key_value_heads=kv_heads, num_local_experts=E,
        num_experts_per_tok=k, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False)
    model = transformers.MixtralForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig(arch="llama")
    cfg.llm.dim = dim
    cfg.llm.hidden_dim = ffn
    cfg.llm.n_layers = 2
    cfg.llm.n_heads = heads
    cfg.llm.n_kv_heads = kv_heads
    cfg.llm.head_size = dim // heads
    cfg.llm.seq_len = 128
    cfg.llm.vocab_size = 256
    cfg.llm.kv_dim = kv_heads * (dim // heads)
    cfg.llm.rope.n_dims = dim // heads
    cfg.llm.rope.freq_base = 10000.0
    cfg.llm.norm_eps = 1e-5
    cfg.llm.n_experts = E
    cfg.llm.n_experts_used = k
    params = params_from_hf_state_dict(_to_sd(model), cfg, fmt=GGMLType.Q8_0)
    assert params.layers.router is not None
    # stacked [L, E, ...] (shardable over "ep"; forward flattens a
    # (layer, expert) view for the kernel's scalar-prefetch index)
    assert params.layers.w_gate_exps.q.shape[:2] == (2, E)

    T = 10
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, (1, T))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()[0]
    kv = KVCache.create(2, 1, 32, kv_heads, dim // heads, dtype="bf16")
    logits, _ = forward(params, cfg.llm, kv, jnp.asarray(tokens),
                        jnp.arange(T)[None, :], backend="xla",
                        logits_mode="all")
    got = np.asarray(logits)[0]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.08, f"logits rel err {rel}"
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"logits correlation {corr}"
