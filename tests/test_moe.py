"""Mixture-of-experts end-to-end: synthetic MoE GGUF -> load ->
generate; stacked-scan vs unrolled equivalence (validates the
(layer, expert) flat-view indexing); expert-parallel sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.kv import KVCache
from powerserve_tpu.models.llama import forward
from powerserve_tpu.models.loader import load_gguf_model
from powerserve_tpu.tools.synthetic import make_synthetic_gguf


@pytest.fixture(scope="module")
def moe_ws(tmp_path_factory):
    out = tmp_path_factory.mktemp("moe")
    make_synthetic_gguf(out, "tiny-moe", GGMLType.Q8_0, seed=0,
                        seq_len=128)
    return out


def test_moe_gguf_loads(moe_ws):
    cfg, params = load_gguf_model(moe_ws / "model")
    assert cfg.llm.n_experts == 4 and cfg.llm.n_experts_used == 2
    assert params.layers.router.shape == (2, 64, 4)  # [L, dim, E]
    assert params.layers.w_gate_exps.q.shape[:2] == (2, 4)  # [L, E, ..]
    assert params.layers.w_gate is None


def test_moe_stacked_matches_unrolled(moe_ws):
    """The stacked scan's layer*E+e flat indexing must agree with the
    unrolled per-layer expert slabs."""
    cfg, ps = load_gguf_model(moe_ws / "model", stacked=True)
    _, pu = load_gguf_model(moe_ws / "model", stacked=False)
    llm = cfg.llm
    rng = np.random.default_rng(0)
    T = 6
    tokens = jnp.asarray(rng.integers(0, llm.vocab_size, (1, T)), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]

    def run(params):
        kv = KVCache.create(llm.n_layers, 1, 32, llm.n_kv_heads,
                            llm.head_size, dtype="int8")
        logits, _ = forward(params, llm, kv, tokens, pos, backend="xla",
                            logits_mode="all")
        return np.asarray(logits)

    a, b = run(ps), run(pu)
    # bf16 accumulation order differs between the scan's flat-view
    # kernels and the unrolled per-layer slabs; an INDEXING bug would
    # produce uncorrelated garbage, not sub-1% noise
    np.testing.assert_allclose(a, b, atol=5e-3)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_moe_engine_generates(moe_ws):
    from powerserve_tpu.engine.generator import InferenceEngine

    cfg, params = load_gguf_model(moe_ws / "model")
    hp = HyperParams(max_slots=1, batch_size=8)
    hp.sampler.temperature = 0.0
    eng = InferenceEngine(params, cfg, hp, backend="xla")
    out1 = list(eng.generate([1, 5, 9, 12], 6))
    eng.reset()
    out2 = list(eng.generate([1, 5, 9, 12], 6))
    assert out1 == out2 and len(out1) == 6
    assert all(0 <= t < cfg.llm.vocab_size for t in out1)


def test_moe_scheduler_serves(moe_ws):
    """MoE composes with continuous batching transparently (forward
    handles the routed FFN; the scheduler is architecture-agnostic)."""
    import queue as _q

    from powerserve_tpu.engine.scheduler import BatchScheduler, Request

    cfg, params = load_gguf_model(moe_ws / "model")
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    s = BatchScheduler(params, cfg, hp, backend="xla")
    outs = []
    for p in ([3, 17, 5, 9], [8, 1, 2]):
        out, done = [], _q.Queue()

        def sink(t, out=out, done=done):
            done.put(True) if t is None else out.append(t)

        s.submit(Request(prompt_ids=p, max_tokens=5, temperature=0.0,
                         sink=sink))
        outs.append((out, done))
    for _ in range(300):
        if all(not d.empty() for _, d in outs):
            break
        s.step()
    assert all(not d.empty() for _, d in outs)
    assert all(len(o) == 5 for o, _ in outs)


def test_moe_expert_parallel_matches_single(moe_ws):
    """Experts sharded over an "ep" mesh axis (shard_map path): each
    device computes its local experts, a psum sums the disjoint routed
    contributions — logits equal the single-device forward."""
    from powerserve_tpu.parallel import make_mesh
    from powerserve_tpu.parallel.tp import (
        shard_kv_tp,
        shard_params_tp,
        tp_forward,
    )

    cfg, params = load_gguf_model(moe_ws / "model", stacked=True)
    llm = cfg.llm
    S, T = 2, 6
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, llm.vocab_size, (S, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (S, T))

    kv0 = KVCache.create(llm.n_layers, S, 32, llm.n_kv_heads,
                         llm.head_size, dtype="int8")
    ref, _ = forward(params, llm, kv0, tokens, pos, backend="xla",
                     logits_mode="all")

    mesh = make_mesh({"ep": 2}, jax.devices()[:2])
    p2 = shard_params_tp(params, mesh, llm)
    assert p2.layers.w_gate_exps.q.sharding.spec[1] == "ep"
    kv2 = shard_kv_tp(KVCache.create(llm.n_layers, S, 32, llm.n_kv_heads,
                                     llm.head_size, dtype="int8"), mesh)
    got, _ = tp_forward(p2, llm, kv2, tokens, pos, mesh=mesh,
                        backend="xla", logits_mode="all")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-3)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(ref).ravel())
    assert corr[0, 1] > 0.999


def test_moe_ep_tp_compose(tmp_path):
    """ep x tp on one mesh: experts split over ep, each expert's
    matmuls split over tp (col gate/up, row down + psum)."""
    from powerserve_tpu.parallel import make_mesh
    from powerserve_tpu.parallel.tp import (
        shard_kv_tp,
        shard_params_tp,
        tp_forward,
    )

    out = tmp_path / "moe128"
    # ffn=128 so the row-parallel down proj's K/32 scale rows divide tp
    make_synthetic_gguf(out, "tiny-moe", GGMLType.Q8_0, seed=1,
                        seq_len=128, ffn=128)
    cfg, params = load_gguf_model(out / "model", stacked=True)
    llm = cfg.llm
    S, T = 2, 5
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, llm.vocab_size, (S, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (S, T))
    kv0 = KVCache.create(llm.n_layers, S, 32, llm.n_kv_heads,
                         llm.head_size, dtype="int8")
    ref, _ = forward(params, llm, kv0, tokens, pos, backend="xla",
                     logits_mode="all")

    mesh = make_mesh({"ep": 2, "tp": 2}, jax.devices()[:4])
    p2 = shard_params_tp(params, mesh, llm)
    kv2 = shard_kv_tp(KVCache.create(llm.n_layers, S, 32, llm.n_kv_heads,
                                     llm.head_size, dtype="int8"), mesh)
    got, _ = tp_forward(p2, llm, kv2, tokens, pos, mesh=mesh,
                        backend="xla", logits_mode="all")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-3)
    assert np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(ref).ravel())[0, 1] > 0.999


def test_moe_convert_hf_roundtrip(tmp_path):
    """HF Mixtral checkpoint -> convert_hf_model workspace -> GGUF load
    -> logits match the HF model (the full offline pipeline for MoE)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from powerserve_tpu.tools.convert_hf import convert_hf_model

    torch.manual_seed(0)
    dim, E, k = 64, 4, 2
    hf_cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=dim, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=E,
        num_experts_per_tok=k, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False)
    model = transformers.MixtralForCausalLM(hf_cfg)
    model.eval()
    src = tmp_path / "hf"
    model.save_pretrained(src, safe_serialization=True)

    ws = convert_hf_model(src, tmp_path / "ws", quant="q8_0")
    cfg, params = load_gguf_model(ws / "model")
    assert cfg.llm.n_experts == E and cfg.llm.n_experts_used == k
    llm = cfg.llm

    rng = np.random.default_rng(0)
    T = 8
    tokens = rng.integers(0, 256, (1, T))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()[0]
    kv = KVCache.create(llm.n_layers, 1, 32, llm.n_kv_heads,
                        llm.head_size, dtype="bf16")
    logits, _ = forward(params, llm, kv, jnp.asarray(tokens),
                        jnp.arange(T, dtype=jnp.int32)[None, :],
                        backend="xla", logits_mode="all")
    got = np.asarray(logits)[0]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.08, f"logits rel err {rel}"
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_moe_chain_spec_matches_plain():
    """MoE composes with on-device chain speculation: full-depth
    self-draft greedy == plain scheduler greedy (the routed FFN runs
    inside the spec scan's draft/verify forwards)."""
    import queue as _q

    from powerserve_tpu.engine.scheduler import BatchScheduler, Request
    from powerserve_tpu.tools.bench_params import make_device_params

    cfg, params = make_device_params("tiny-moe", "q8_0")

    def run_req(sched, prompt):
        out, done = [], _q.Queue()

        def sink(t):
            done.put(True) if t is None else out.append(t)

        sched.submit(Request(prompt_ids=prompt, max_tokens=6,
                             temperature=0.0, sink=sink))
        for _ in range(300):
            if not done.empty():
                break
            sched.step()
        assert not done.empty()
        return out

    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=128)
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = run_req(plain, [3, 17, 5, 9])

    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=128,
                      spec_k=3)
    spec = BatchScheduler(params, cfg, hp2, backend="xla",
                          draft_params=params, draft_llm=cfg.llm)
    got = run_req(spec, [3, 17, 5, 9])
    assert got == want, (got, want)


def test_moe_single_token_routed_fast_path(moe_ws):
    """Batch-1 decode follows the routed expert ids with the kernel's
    scalar-prefetch index (reads k of E experts); logits must match the
    all-experts prefill at the same position."""
    cfg, params = load_gguf_model(moe_ws / "model")
    llm = cfg.llm
    rng = np.random.default_rng(4)
    toks = rng.integers(0, llm.vocab_size, 5).tolist()

    # all-experts path: Tq=5 prefill, logits at the last position
    kv = KVCache.create(llm.n_layers, 1, 32, llm.n_kv_heads,
                        llm.head_size, dtype="int8")
    ref, _ = forward(params, llm, kv, jnp.asarray([toks]),
                     jnp.arange(5, dtype=jnp.int32)[None, :],
                     backend="xla", logits_mode="last")

    # fast path: prefill 4, decode token 5 alone (S*Tq == 1)
    kv = KVCache.create(llm.n_layers, 1, 32, llm.n_kv_heads,
                        llm.head_size, dtype="int8")
    _, kv = forward(params, llm, kv, jnp.asarray([toks[:4]]),
                    jnp.arange(4, dtype=jnp.int32)[None, :],
                    backend="xla", logits_mode="none")
    got, _ = forward(params, llm, kv, jnp.asarray([[toks[4]]]),
                     jnp.full((1, 1), 4, jnp.int32), backend="xla",
                     logits_mode="last")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3)
    assert np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(ref).ravel())[0, 1] > 0.999
