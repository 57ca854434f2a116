"""EAGLE draft-head speculation (speculative/eagle.py).

Losslessness: greedy EAGLE output must equal vanilla greedy decode for
ANY head weights. Acceptance machinery: an exact-replica head (fc =
[I; 0], layer = the 1-layer target's own layer) reproduces the target's
computation, so every draft must be accepted — proving the feature
plumbing (root_feat carry, true-feature cache re-prefill) is aligned.
Converter: HF eagle checkpoint -> GGUF -> load round-trips numerics.
"""

import dataclasses
import json

import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.core.config import ModelConfig
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.models.llama import forward
from powerserve_tpu.models.loader import (
    _qlinear_from_float,
    load_eagle_gguf,
    params_from_hf_state_dict,
)
from powerserve_tpu.speculative.eagle import (
    EagleChainEngine,
    EagleParams,
    eagle_forward,
)

DIM = 64


def _mk_target(seed=0, layers=1, stacked=False):
    import torch
    import transformers

    torch.manual_seed(seed)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=DIM, intermediate_size=2 * DIM,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    cfg = ModelConfig(arch="llama")
    llm = cfg.llm
    llm.dim = DIM
    llm.hidden_dim = 2 * DIM
    llm.n_layers = layers
    llm.n_heads = 4
    llm.n_kv_heads = 2
    llm.head_size = DIM // 4
    llm.seq_len = 256
    llm.vocab_size = 256
    llm.kv_dim = 2 * (DIM // 4)
    llm.rope.n_dims = DIM // 4
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg, fmt=GGMLType.Q8_0,
                                       stacked=stacked, fuse=False)
    return params, cfg, sd


def _vanilla_greedy(params, cfg, prompt, n):
    kv = KVCache.create(cfg.llm.n_layers, 1, 256, cfg.llm.n_kv_heads,
                        cfg.llm.head_size, dtype="bf16")
    toks = list(prompt)
    pos = jnp.arange(len(toks) - 1)[None, :]
    _, kv = forward(params, cfg.llm, kv, jnp.asarray([toks[:-1]]), pos,
                    backend="xla", logits_mode="none")
    cur = toks[-1]
    out = []
    for i in range(n):
        p = len(toks) - 1 + i
        logits, kv = forward(params, cfg.llm, kv, jnp.asarray([[cur]]),
                             jnp.asarray([[p]], jnp.int32),
                             backend="xla", logits_mode="last")
        cur = int(jnp.argmax(logits[0, : cfg.llm.vocab_size]))
        out.append(cur)
    return out


def _identity_fc():
    w = np.concatenate([np.eye(DIM, dtype=np.float32),
                        np.zeros((DIM, DIM), np.float32)], axis=1)
    return _qlinear_from_float(w, GGMLType.Q8_0)


def test_eagle_exact_replica_full_acceptance():
    """fc=[I;0] + the 1-layer target's own layer == the target itself:
    greedy output matches vanilla AND every draft is accepted."""
    from powerserve_tpu.speculative.engine import SpecStats

    params, cfg, _ = _mk_target(0, layers=1)
    prompt = [3, 17, 5, 9]
    want = _vanilla_greedy(params, cfg, prompt, 24)

    ep = EagleParams(
        fc=_identity_fc(), fc_bias=None, layers=(params.layers[0],),
        embed=params.embed, lm_head=params.lm_head,
        out_norm=params.out_norm, input_norm=True)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)
    stats = SpecStats()
    eng = EagleChainEngine(params, cfg, ep, e_llm, k=3, block_steps=4,
                           backend="xla", kv_dtype="bf16")
    got = list(eng.generate(prompt, 24, stats=stats))
    assert got == want, (got, want)
    assert stats.accepted / max(stats.drafted, 1) >= 0.8, stats


def test_eagle_greedy_matches_vanilla_random_head():
    """Losslessness holds for an unrelated (random) head too."""
    params, cfg, _ = _mk_target(0, layers=2)
    d_params, _, _ = _mk_target(7, layers=1)
    prompt = [3, 17, 5, 9]
    want = _vanilla_greedy(params, cfg, prompt, 20)

    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)
    eng = EagleChainEngine(params, cfg, ep, e_llm, k=3, block_steps=4,
                           backend="xla", kv_dtype="bf16")
    got = list(eng.generate(prompt, 20))
    assert got == want, (got, want)


def _eagle_hf_checkpoint(tmp_path, rng):
    """Write an official-layout EAGLE checkpoint (bare layers.N names,
    layer 0 without input_layernorm — EAGLE-1 identity semantics)."""
    from safetensors.numpy import save_file

    d = tmp_path / "eagle_hf"
    d.mkdir()
    H, Hkv, hd = 4, 2, DIM // 4
    sd = {
        "fc.weight": rng.standard_normal((DIM, 2 * DIM)).astype(np.float32)
        * 0.05,
        "fc.bias": rng.standard_normal(DIM).astype(np.float32) * 0.01,
        "layers.0.self_attn.q_proj.weight":
            rng.standard_normal((H * hd, DIM)).astype(np.float32) * 0.05,
        "layers.0.self_attn.k_proj.weight":
            rng.standard_normal((Hkv * hd, DIM)).astype(np.float32) * 0.05,
        "layers.0.self_attn.v_proj.weight":
            rng.standard_normal((Hkv * hd, DIM)).astype(np.float32) * 0.05,
        "layers.0.self_attn.o_proj.weight":
            rng.standard_normal((DIM, H * hd)).astype(np.float32) * 0.05,
        "layers.0.post_attention_layernorm.weight":
            np.ones(DIM, np.float32),
        "layers.0.mlp.gate_proj.weight":
            rng.standard_normal((2 * DIM, DIM)).astype(np.float32) * 0.05,
        "layers.0.mlp.up_proj.weight":
            rng.standard_normal((2 * DIM, DIM)).astype(np.float32) * 0.05,
        "layers.0.mlp.down_proj.weight":
            rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
    }
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "model_type": "eagle", "hidden_size": DIM,
        "intermediate_size": 2 * DIM, "num_hidden_layers": 1,
        "num_attention_heads": H, "num_key_value_heads": Hkv,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-5, "vocab_size": 256}))
    return d, sd


def test_eagle_convert_load_roundtrip(tmp_path):
    """convert_eagle -> load_eagle_gguf reproduces in-memory params."""
    from powerserve_tpu.tools.convert_hf import convert_eagle

    params, cfg, _ = _mk_target(0, layers=1)
    rng = np.random.default_rng(3)
    hf_dir, sd = _eagle_hf_checkpoint(tmp_path, rng)
    out = convert_eagle(hf_dir, tmp_path / "eagle_ws", quant="q8_0")
    e_llm, ep = load_eagle_gguf(out, params, cfg.llm)

    assert not ep.input_norm  # layer 0 has no input_layernorm tensor
    assert len(ep.layers) == 1
    assert ep.out_norm is None
    assert ep.lm_head is params.lm_head  # shared with the target
    assert e_llm.n_layers == 1 and e_llm.dim == DIM

    # numerics: loaded head == head built directly from the same floats
    lw = ep.layers[0]
    ref = EagleParams(
        fc=_qlinear_from_float(sd["fc.weight"], GGMLType.Q8_0),
        fc_bias=jnp.asarray(sd["fc.bias"]),
        layers=(dataclasses.replace(
            lw,
            wq=_qlinear_from_float(sd["layers.0.self_attn.q_proj.weight"],
                                   GGMLType.Q8_0),
            wk=_qlinear_from_float(sd["layers.0.self_attn.k_proj.weight"],
                                   GGMLType.Q8_0),
            wv=_qlinear_from_float(sd["layers.0.self_attn.v_proj.weight"],
                                   GGMLType.Q8_0),
            wo=_qlinear_from_float(sd["layers.0.self_attn.o_proj.weight"],
                                   GGMLType.Q8_0),
            w_gate=_qlinear_from_float(sd["layers.0.mlp.gate_proj.weight"],
                                       GGMLType.Q8_0),
            w_up=_qlinear_from_float(sd["layers.0.mlp.up_proj.weight"],
                                     GGMLType.Q8_0),
            w_down=_qlinear_from_float(sd["layers.0.mlp.down_proj.weight"],
                                       GGMLType.Q8_0),
        ),),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)

    e_llm2 = dataclasses.replace(cfg.llm, n_layers=1)
    toks = jnp.asarray([[5, 9, 2]], jnp.int32)
    feats = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 3, DIM)), jnp.float32)
    pos = jnp.arange(3, dtype=jnp.int32)[None, :]

    def run(p):
        kv = KVCache.create(1, 1, 64, e_llm2.n_kv_heads, e_llm2.head_size,
                            dtype="bf16")
        logits, feat, _ = eagle_forward(p, e_llm2, kv, toks, feats, pos,
                                        backend="xla", logits_mode="all")
        return np.asarray(logits), np.asarray(feat)

    la, fa = run(ep)
    lb, fb = run(ref)
    np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(fa, fb, rtol=1e-4, atol=1e-4)


def _run_sched(sched, prompts, max_tokens=8):
    """Submit all prompts, drive step() to completion, return outputs."""
    import queue as _q

    from powerserve_tpu.engine.scheduler import Request

    outs = [[] for _ in prompts]
    done = _q.Queue()

    def mk_sink(out):
        def sink(t):
            if t is None:
                done.put(True)
            else:
                out.append(t)
        return sink

    for p, out in zip(prompts, outs):
        sched.submit(Request(prompt_ids=list(p), max_tokens=max_tokens,
                             temperature=0.0, sink=mk_sink(out)))
    finished = 0
    while finished < len(prompts):
        busy = sched.step()
        while not done.empty():
            done.get()
            finished += 1
        if not busy and done.empty() and finished < len(prompts):
            break
    return outs


def test_eagle_batched_scheduler_matches_plain():
    """EAGLE x continuous batching: concurrent slots drafted by a
    RANDOM head (worst-case acceptance) still emit exactly the plain
    scheduler's greedy tokens — losslessness survives batching, padded
    lanes, and the per-slot feature carry."""
    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.scheduler import BatchScheduler

    params, cfg, _ = _mk_target(0, layers=2)
    d_params, _, _ = _mk_target(7, layers=1)
    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)

    prompts = [[3, 17, 5, 9], [1, 2, 3, 4, 5, 6, 7]]
    hp = HyperParams(max_slots=2, batch_size=8)
    hp.max_seq_len = 128
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = _run_sched(plain, prompts)

    hp2 = HyperParams(max_slots=2, batch_size=8)
    hp2.max_seq_len = 128
    hp2.spec_k = 3
    eagle = BatchScheduler(params, cfg, hp2, backend="xla",
                           eagle_params=ep, eagle_llm=e_llm)
    got = _run_sched(eagle, prompts)
    assert got == want, (got, want)


def test_eagle_tree_scheduler_matches_plain():
    """hp.spec_tree runs EAGLE-2-style tree drafting per slot; greedy
    output must equal the plain scheduler's (losslessness for trees:
    sibling hedging changes acceptance, never emitted tokens)."""
    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.scheduler import BatchScheduler

    params, cfg, _ = _mk_target(0, layers=2)
    d_params, _, _ = _mk_target(7, layers=1)
    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)

    prompts = [[3, 17, 5, 9], [1, 2, 3, 4, 5]]
    hp = HyperParams(max_slots=2, batch_size=8)
    hp.max_seq_len = 128
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = _run_sched(plain, prompts)

    hp2 = HyperParams(max_slots=2, batch_size=8)
    hp2.max_seq_len = 128
    hp2.spec_tree = "2,1"
    eagle = BatchScheduler(params, cfg, hp2, backend="xla",
                           eagle_params=ep, eagle_llm=e_llm)
    assert eagle.spec_template is not None
    got = _run_sched(eagle, prompts)
    assert got == want, (got, want)


def test_eagle_scheduler_prefix_cache_reuse():
    """The prefix cache must carry the EAGLE feature alongside both KV
    prefixes: a second identical request skips prefill and still emits
    identical greedy output (wrong/missing feature would desync the
    head on the first drafted token)."""
    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.scheduler import BatchScheduler

    params, cfg, _ = _mk_target(0, layers=1)
    ep = EagleParams(
        fc=_identity_fc(), fc_bias=None, layers=(params.layers[0],),
        embed=params.embed, lm_head=params.lm_head,
        out_norm=params.out_norm, input_norm=True)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)

    hp = HyperParams(max_slots=2, batch_size=8)
    hp.max_seq_len = 128
    hp.spec_k = 2
    hp.prefix_cache_min = 16
    sched = BatchScheduler(params, cfg, hp, backend="xla",
                           eagle_params=ep, eagle_llm=e_llm)
    prompt = list(range(3, 43))  # prefill region 39 >= prefix_cache_min
    first = _run_sched(sched, [prompt], max_tokens=6)[0]
    assert sched.prefix_cache.hits == 0
    second = _run_sched(sched, [prompt], max_tokens=6)[0]
    assert sched.prefix_cache.hits == 1
    assert second == first


def test_eagle_tree_engine_matches_vanilla():
    """Single-stream EAGLE-2-style tree drafting is lossless too."""
    from powerserve_tpu.speculative.device_tree import TreeTemplate

    params, cfg, _ = _mk_target(0, layers=2)
    d_params, _, _ = _mk_target(7, layers=1)
    prompt = [3, 17, 5, 9]
    want = _vanilla_greedy(params, cfg, prompt, 16)

    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)
    eng = EagleChainEngine(params, cfg, ep, e_llm, block_steps=4,
                           backend="xla", kv_dtype="bf16",
                           template=TreeTemplate.from_widths([2, 1]))
    got = list(eng.generate(prompt, 16))
    assert got == want, (got, want)


def test_eagle_rejection_sampling_lossless():
    """Stochastic EAGLE (sample=True at temperature): the first emitted
    token's marginal equals the target's sampling distribution, and a
    perfect head (exact replica of a 1-layer target: q == p) accepts
    nearly everything."""
    import jax

    from powerserve_tpu.kv.cache import KVCache
    from powerserve_tpu.models.llama import forward
    from powerserve_tpu.sampling.sampler import sample_dist_batched
    from powerserve_tpu.speculative.eagle import eagle_spec_scan

    params, cfg, _ = _mk_target(0, layers=1)
    llm = cfg.llm
    ep = EagleParams(
        fc=_identity_fc(), fc_bias=None, layers=(params.layers[0],),
        embed=params.embed, lm_head=params.lm_head,
        out_norm=params.out_norm, input_norm=True)
    e_llm = dataclasses.replace(llm, n_layers=1)

    S, k = 4096, 3
    root = jnp.full((S,), 7, jnp.int32)
    root_feat = jnp.zeros((S, DIM), jnp.float32)
    temp = jnp.full((S,), 1.0, jnp.float32)
    top_k = jnp.full((S,), 8, jnp.int32)
    top_p = jnp.ones((S,), jnp.float32)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))

    def fresh(l):
        return KVCache.create(l.n_layers, S, 16, l.n_kv_heads,
                              l.head_size, "bf16")

    logits, _ = forward(params, llm, fresh(llm), root[:, None],
                        jnp.zeros((S, 1), jnp.int32), backend="xla",
                        logits_mode="last")
    p0 = np.asarray(sample_dist_batched(
        logits[:, :llm.vocab_size], temp, top_k, top_p)[0])

    emitted, counts, *_ = eagle_spec_scan(
        params, ep, fresh(llm), fresh(e_llm), root, root_feat, llm,
        e_llm, 1, k, "xla", rngs=rngs, temp=temp, top_k=top_k,
        top_p=top_p, sample=True)
    emitted = np.asarray(emitted)[0]
    counts = np.asarray(counts)[0]
    hist = np.bincount(emitted[:, 0], minlength=llm.vocab_size
                       ).astype(np.float64)
    hist /= hist.sum()
    tv = 0.5 * np.abs(hist - p0).sum()
    assert tv < 0.08, f"first-token marginal TV {tv}"
    assert counts.mean() > 0.9 * (k + 1), counts.mean()


def test_eagle_engine_reset_reuse():
    """Engine state fully resets between prompts (cache isolation)."""
    params, cfg, _ = _mk_target(0, layers=1)
    ep = EagleParams(
        fc=_identity_fc(), fc_bias=None, layers=(params.layers[0],),
        embed=params.embed, lm_head=params.lm_head,
        out_norm=params.out_norm, input_norm=True)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)
    eng = EagleChainEngine(params, cfg, ep, e_llm, k=2, block_steps=2,
                           backend="xla", kv_dtype="bf16")
    a1 = list(eng.generate([3, 17, 5, 9], 8))
    eng.reset()
    a2 = list(eng.generate([3, 17, 5, 9], 8))
    assert a1 == a2


def test_eagle_paged_scheduler_matches_plain():
    """EAGLE composes with the PAGED target KV pool: random-head greedy
    output equals the plain dense scheduler's, through deferred
    admission and page growth during spec ticks."""
    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.scheduler import BatchScheduler

    params, cfg, _ = _mk_target(0, layers=2)
    d_params, _, _ = _mk_target(7, layers=1)
    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)

    prompts = [[3, 17, 5, 9], [1, 2, 3, 4, 5, 6, 7]]
    hp = HyperParams(max_slots=2, batch_size=8)
    hp.max_seq_len = 128
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = _run_sched(plain, prompts)

    hp2 = HyperParams(max_slots=2, batch_size=8, paged_pages=10,
                      page_size=8)
    hp2.max_seq_len = 128
    hp2.spec_k = 3
    eagle = BatchScheduler(params, cfg, hp2, backend="xla",
                           eagle_params=ep, eagle_llm=e_llm)
    got = _run_sched(eagle, prompts)
    assert got == want, (got, want)


def test_eagle_wor_tree_scheduler_matches_plain():
    """hp.spec_wor routes EAGLE trees to sampled-without-replacement
    verification; greedy output equals the plain scheduler's (one-hot
    p/q collapse the recursive rejection to exact greedy)."""
    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.engine.scheduler import BatchScheduler

    params, cfg, _ = _mk_target(0, layers=2)
    d_params, _, _ = _mk_target(7, layers=1)
    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)

    prompts = [[3, 17, 5, 9], [1, 2, 3, 4, 5]]
    hp = HyperParams(max_slots=2, batch_size=8)
    hp.max_seq_len = 128
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = _run_sched(plain, prompts)

    hp2 = HyperParams(max_slots=2, batch_size=8, spec_wor=True)
    hp2.max_seq_len = 128
    hp2.spec_tree = "2,1"
    eagle = BatchScheduler(params, cfg, hp2, backend="xla",
                           eagle_params=ep, eagle_llm=e_llm)
    got = _run_sched(eagle, prompts)
    assert got == want, (got, want)


def test_eagle_wor_replica_head_full_acceptance():
    """WOR verification with an exact-replica head (q == p): rank-0
    candidates always accept, so every step emits max_depth + 1 tokens
    even at temperature."""
    import jax
    from powerserve_tpu.speculative.device_tree import TreeTemplate
    from powerserve_tpu.speculative.eagle import eagle_tree_spec_scan

    params, cfg, _ = _mk_target(0, layers=1, stacked=False)
    llm = cfg.llm
    # replica head: identical layer + identity feature mixer -> the
    # head's logits equal the target's at every node
    ep = EagleParams(fc=_identity_fc(), fc_bias=None,
                     layers=(params.layers[0],), embed=params.embed,
                     lm_head=params.lm_head, out_norm=params.out_norm,
                     input_norm=True)
    e_llm = cfg.llm
    S = 64
    tpl = TreeTemplate.from_widths([2, 1])
    t_kv = KVCache.create(llm.n_layers, S, 32, llm.n_kv_heads,
                          llm.head_size, "int8")
    e_kv = KVCache.create(llm.n_layers, S, 32, llm.n_kv_heads,
                          llm.head_size, "int8")
    from powerserve_tpu.models.llama import forward as fwd
    from powerserve_tpu.speculative.eagle import eagle_forward

    prompt = jnp.broadcast_to(jnp.asarray([3, 17, 5], jnp.int32), (S, 3))
    pos = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32), (S, 3))
    _, t_kv, feats = fwd(params, llm, t_kv, prompt, pos, backend="xla",
                         logits_mode="none", return_final_hidden=True)
    feats = feats.astype(jnp.float32)
    head_feats = jnp.concatenate(
        [jnp.zeros((S, 1, llm.dim)), feats[:, :-1]], axis=1)
    _, _, e_kv = eagle_forward(ep, e_llm, e_kv, prompt, head_feats, pos,
                               backend="xla", logits_mode="none")
    root = jnp.full((S,), 9, jnp.int32)
    root_feat = feats[:, -1]
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))
    emitted, counts, *_ = eagle_tree_spec_scan(
        params, ep, t_kv, e_kv, root, root_feat, llm, e_llm, 2,
        tpl.key(), "xla", rngs=rngs,
        temp=jnp.ones(S), top_k=jnp.full(S, 8, jnp.int32),
        top_p=jnp.ones(S), sample="wor")
    counts = np.asarray(counts)
    assert counts.mean() > 0.95 * (tpl.max_depth + 1), counts.mean()


def test_eagle_window_verify_matches_carry(monkeypatch):
    """eagle_spec_scan with the WINDOW target verify (stacked quantized
    target: cache loop-invariant, lane-validity rollback, one post-scan
    commit) emits byte-identical streams AND final target-cache state
    to the legacy carried-rollback loop — greedy and sampled."""
    import jax

    import powerserve_tpu.engine.loops as L
    from powerserve_tpu.speculative.eagle import eagle_spec_scan

    params, cfg, _ = _mk_target(0, layers=2, stacked=True)
    llm = cfg.llm
    d_params, _, _ = _mk_target(7, layers=1)
    rng = np.random.default_rng(3)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(llm, n_layers=1)

    S, k, n_steps = 2, 3, 4
    root = jnp.asarray([7, 42], jnp.int32)
    root_feat = jnp.asarray(
        np.random.default_rng(5).standard_normal((S, DIM)), jnp.float32)

    def run(loop, sample):
        monkeypatch.setattr(L, "_DECODE_LOOP_DEFAULT", loop)
        t_kv = KVCache.create(llm.n_layers, S, 64, llm.n_kv_heads,
                              llm.head_size)  # int8: window-eligible
        e_kv = KVCache.create(1, S, 64, llm.n_kv_heads, llm.head_size,
                              "bf16")
        kw = {}
        if sample:
            kw = dict(rngs=jax.vmap(jax.random.PRNGKey)(jnp.arange(S)),
                      temp=jnp.ones(S), top_k=jnp.full(S, 8, jnp.int32),
                      top_p=jnp.ones(S), sample=True)
        em, cn, t_kv, *_ = eagle_spec_scan(
            params, ep, t_kv, e_kv, root, root_feat, llm, e_llm,
            n_steps, k, "xla", **kw)
        return (np.asarray(em), np.asarray(cn), np.asarray(t_kv.k),
                np.asarray(t_kv.k_scale), np.asarray(t_kv.mask),
                np.asarray(t_kv.pos))

    for sample in (False, True):
        w = run("window", sample)
        c = run("carry", sample)
        for a, b in zip(w, c):
            np.testing.assert_array_equal(a, b)


def test_eagle_tree_window_verify_matches_carry(monkeypatch):
    """eagle_tree_spec_scan with the WINDOW target verify (tree nodes
    land in lanes; acceptance marks path nodes valid at lane_pos =
    c + depth — replacing rollback + commit_tokens gather-compaction)
    emits byte-identical streams and committed target-cache state to
    the legacy carried loop — greedy and sampled-WOR. Cache contents
    compare only where mask=True: the carry loop's compaction leaves
    stale node writes above pos that the window never lands."""
    import jax

    import powerserve_tpu.engine.loops as L
    from powerserve_tpu.speculative.device_tree import TreeTemplate
    from powerserve_tpu.speculative.eagle import eagle_tree_spec_scan

    params, cfg, _ = _mk_target(0, layers=2, stacked=True)
    llm = cfg.llm
    d_params, _, _ = _mk_target(7, layers=1)
    rng = np.random.default_rng(3)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(llm, n_layers=1)
    tpl = TreeTemplate.from_widths([2, 2, 1])

    S, n_steps = 2, 4
    root = jnp.asarray([7, 42], jnp.int32)
    root_feat = jnp.asarray(
        np.random.default_rng(5).standard_normal((S, DIM)), jnp.float32)

    def run(loop, sample):
        monkeypatch.setattr(L, "_DECODE_LOOP_DEFAULT", loop)
        t_kv = KVCache.create(llm.n_layers, S, 96, llm.n_kv_heads,
                              llm.head_size)  # int8: window-eligible
        e_kv = KVCache.create(1, S, 96, llm.n_kv_heads, llm.head_size,
                              "bf16")
        kw = {}
        if sample:
            kw = dict(rngs=jax.vmap(jax.random.PRNGKey)(jnp.arange(S)),
                      temp=jnp.ones(S), top_k=jnp.full(S, 8, jnp.int32),
                      top_p=jnp.ones(S), sample="wor")
        em, cn, t_kv, *_ = eagle_tree_spec_scan(
            params, ep, t_kv, e_kv, root, root_feat, llm, e_llm,
            n_steps, tpl.key(), "xla", **kw)
        m = np.asarray(t_kv.mask)
        return (np.asarray(em), np.asarray(cn), m, np.asarray(t_kv.pos),
                np.asarray(t_kv.k) * m[None, :, None, :, None],
                np.asarray(t_kv.k_scale) * m[None, :, None, :],
                np.asarray(t_kv.v) * m[None, :, None, :, None])

    for sample in (False, True):
        w = run("window", sample)
        c = run("carry", sample)
        for a, b in zip(w, c):
            np.testing.assert_array_equal(a, b)


def test_eagle_head_window_matches_carry(monkeypatch):
    """The HEAD-cache window (r4: k draft lanes + k+1 commit lanes per
    step; the true-feature re-prefill supersedes the draft lanes) is
    byte-equivalent to the carried head cache — emitted streams, target
    cache, and the head cache's committed state (pos/mask + masked
    K/V)."""
    import jax

    import powerserve_tpu.engine.loops as L
    from powerserve_tpu.speculative.eagle import eagle_spec_scan

    params, cfg, _ = _mk_target(0, layers=2, stacked=True)
    llm = cfg.llm
    d_params, _, _ = _mk_target(7, layers=1)
    rng = np.random.default_rng(3)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(llm, n_layers=1)

    S, k, n_steps = 2, 3, 4
    root = jnp.asarray([7, 42], jnp.int32)
    root_feat = jnp.asarray(
        np.random.default_rng(5).standard_normal((S, DIM)), jnp.float32)

    def run(loop, sample):
        monkeypatch.setattr(L, "_DECODE_LOOP_DEFAULT", loop)
        t_kv = KVCache.create(llm.n_layers, S, 64, llm.n_kv_heads,
                              llm.head_size)  # int8
        e_kv = KVCache.create(1, S, 64, llm.n_kv_heads, llm.head_size)
        kw = {}
        if sample:
            kw = dict(rngs=jax.vmap(jax.random.PRNGKey)(jnp.arange(S)),
                      temp=jnp.ones(S), top_k=jnp.full(S, 8, jnp.int32),
                      top_p=jnp.ones(S), sample=True)
        em, cn, t_kv, e_kv, *_ = eagle_spec_scan(
            params, ep, t_kv, e_kv, root, root_feat, llm, e_llm,
            n_steps, k, "xla", **kw)
        m = np.asarray(e_kv.mask)
        return (np.asarray(em), np.asarray(cn), np.asarray(t_kv.pos),
                np.asarray(t_kv.mask), np.asarray(e_kv.pos), m,
                np.asarray(e_kv.k) * m[None, :, None, :, None],
                np.asarray(e_kv.v) * m[None, :, None, :, None],
                np.asarray(e_kv.k_scale) * m[None, :, None, :])

    for sample in (False, True):
        w = run("window", sample)
        c = run("carry", sample)
        for a, b in zip(w, c):
            np.testing.assert_array_equal(a, b)


def test_eagle_tree_head_window_matches_carry(monkeypatch):
    """The EAGLE-tree HEAD-cache window (r5: per-query draft-lane
    visibility + commit lanes, no rollback) must match the carried
    head byte-for-byte — greedy and WOR, across two consecutive scans
    (the second continues from window-committed head state)."""
    import jax

    import powerserve_tpu.engine.loops as L
    from powerserve_tpu.engine.loops import prefill_step
    from powerserve_tpu.speculative.device_tree import TreeTemplate
    from powerserve_tpu.speculative.eagle import eagle_tree_spec_scan

    params, cfg, _ = _mk_target(0, layers=2, stacked=True)
    d_params, _, _ = _mk_target(7, layers=1, stacked=False)
    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((DIM, 2 * DIM)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    ep = EagleParams(
        fc=fc, fc_bias=None, layers=(d_params.layers[0],),
        embed=params.embed, lm_head=params.lm_head, out_norm=None,
        input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)
    llm = cfg.llm
    tpl = TreeTemplate.from_widths([2, 2, 1])
    prompt = [3, 17, 5, 9]

    def run(head_window, wor):
        monkeypatch.setattr(L, "_DECODE_LOOP_DEFAULT", "window")
        monkeypatch.setenv("POWERSERVE_EAGLE_HEAD_WINDOW",
                           "1" if head_window else "0")
        t_kv = KVCache.create(llm.n_layers, 1, 128, llm.n_kv_heads,
                              llm.head_size, "int8")
        e_kv = KVCache.create(1, 1, 128, e_llm.n_kv_heads,
                              e_llm.head_size, "int8")
        toks = jnp.asarray([prompt[:-1]], jnp.int32)
        pos = jnp.arange(3, dtype=jnp.int32)[None, :]
        _, t_kv, feats = forward(params, llm, t_kv, toks, pos,
                                 backend="xla", logits_mode="none",
                                 return_final_hidden=True)
        from powerserve_tpu.speculative.eagle import eagle_forward

        head_feats = jnp.concatenate(
            [jnp.zeros((1, 1, DIM)), feats[:, :-1].astype(jnp.float32)],
            axis=1)
        _, _, e_kv = eagle_forward(ep, e_llm, e_kv, toks, head_feats,
                                   pos, backend="xla",
                                   logits_mode="none")
        root = jnp.asarray([prompt[-1]], jnp.int32)
        root_feat = feats[:, -1].astype(jnp.float32)
        kw = {}
        if wor:
            kw.update(rngs=jax.vmap(jax.random.PRNGKey)(jnp.arange(1)),
                      temp=jnp.zeros(1), top_k=jnp.full(1, 8, jnp.int32),
                      top_p=jnp.ones(1), sample="wor")
        outs = []
        for _ in range(2):
            (emitted, counts, t_kv, e_kv, root, root_feat,
             _r) = eagle_tree_spec_scan(
                params, ep, t_kv, e_kv, root, root_feat, llm, e_llm,
                3, tpl.key(), "xla", **kw)
            outs.append((np.asarray(emitted), np.asarray(counts)))
        return outs, (np.asarray(t_kv.pos), np.asarray(e_kv.pos),
                      np.asarray(e_kv.mask))

    for wor in (False, True):
        w_out, w_state = run(True, wor)
        c_out, c_state = run(False, wor)
        for (we, wc), (ce, cc) in zip(w_out, c_out):
            assert (wc == cc).all(), (wor, wc, cc)
            assert (we == ce).all(), (wor, we, ce)
        for a, b in zip(w_state, c_state):
            assert (a == b).all(), wor
