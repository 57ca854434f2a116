"""Pipeline parallelism (parallel/pp.py) on the virtual CPU mesh:
layer-sharded stages + ppermute activation flow must reproduce the
single-device forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.kv import KVCache
from powerserve_tpu.models.llama import forward
from powerserve_tpu.parallel import make_mesh
from powerserve_tpu.parallel.pp import (
    pp_decode_scan,
    pp_forward,
    pp_prefill_microbatched,
    shard_kv_pp,
    shard_params_pp,
)
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS

PRESETS.setdefault("pptest", dict(dim=128, ffn=256, layers=4, heads=4,
                                  kv_heads=2, vocab=512, arch="llama",
                                  bias=False))


@pytest.fixture(scope="module")
def model():
    return make_device_params("pptest", quant="q8_0", stacked=True)


def _fresh_kv(llm, S=4, T=32):
    return KVCache.create(llm.n_layers, S, T, llm.n_kv_heads,
                          llm.head_size, dtype="int8")


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_forward_matches_single(model, pp):
    cfg, params = model
    llm = cfg.llm
    S = 4
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, llm.vocab_size, (S, 4)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (S, 4))

    ref, kv_ref = forward(params, llm, _fresh_kv(llm), tokens, pos,
                          backend="xla", logits_mode="all")

    mesh = make_mesh({"pp": pp}, jax.devices()[:pp])
    p2 = shard_params_pp(params, mesh, llm)
    kv2 = shard_kv_pp(_fresh_kv(llm), mesh)
    got, kv2 = pp_forward(p2, llm, kv2, tokens, pos, mesh=mesh,
                          backend="xla", logits_mode="all")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(kv2.mask),
                                  np.asarray(kv_ref.mask))
    np.testing.assert_array_equal(np.asarray(kv2.pos),
                                  np.asarray(kv_ref.pos))
    np.testing.assert_array_equal(np.asarray(kv2.k), np.asarray(kv_ref.k))


def test_pp_decode_chain_matches_single(model):
    """Greedy prefill + multi-step decode through the pipe equals the
    single-device chain token-for-token."""
    from powerserve_tpu.engine.loops import decode_scan, prefill_step

    cfg, params = model
    llm = cfg.llm
    S = 2
    prompt = jnp.asarray([[3, 17, 5, 9], [8, 1, 2, 6]], jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (S, 4))

    logits, kv = prefill_step(params, prompt, pos, _fresh_kv(llm, S=S),
                              llm, "xla")
    cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    want, _ = decode_scan(params, cur, kv, llm, 8, "xla")

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p2 = shard_params_pp(params, mesh, llm)
    kv2 = shard_kv_pp(_fresh_kv(llm, S=S), mesh)
    logits2, kv2 = pp_forward(p2, llm, kv2, prompt, pos, mesh=mesh,
                              backend="xla", logits_mode="last")
    cur2 = jnp.argmax(logits2, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(cur2), np.asarray(cur))
    got, _ = pp_decode_scan(p2, cur2, kv2, llm, 8, mesh, "xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pp_microbatched_prefill_matches_single(model):
    """GPipe-style microbatched prefill fills the same KV as the
    single-device prefill (verified through the next decode step)."""
    from powerserve_tpu.engine.loops import prefill_step

    cfg, params = model
    llm = cfg.llm
    S, C = 4, 8
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, llm.vocab_size, (S, C)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), (S, C))

    _, kv_ref = prefill_step(params, tokens, pos, _fresh_kv(llm, S=S),
                             llm, "xla")

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p2 = shard_params_pp(params, mesh, llm)
    kv2 = shard_kv_pp(_fresh_kv(llm, S=S), mesh)
    kv2 = pp_prefill_microbatched(p2, llm, kv2, tokens, pos, mesh=mesh,
                                  n_micro=2, backend="xla")
    np.testing.assert_array_equal(np.asarray(kv2.pos),
                                  np.asarray(kv_ref.pos))
    np.testing.assert_array_equal(np.asarray(kv2.mask),
                                  np.asarray(kv_ref.mask))
    np.testing.assert_array_equal(np.asarray(kv2.k), np.asarray(kv_ref.k))
    np.testing.assert_array_equal(np.asarray(kv2.v), np.asarray(kv_ref.v))

    # the caches must be interchangeable for the next decode step
    cur = jnp.asarray([5, 6, 7, 8], jnp.int32)
    l_ref, _ = forward(params, llm, kv_ref, cur[:, None],
                       kv_ref.pos[:, None].astype(jnp.int32),
                       backend="xla", logits_mode="last")
    l_pp, _ = pp_forward(p2, llm, kv2, cur[:, None],
                         kv2.pos[:, None].astype(jnp.int32), mesh=mesh,
                         backend="xla", logits_mode="last")
    np.testing.assert_allclose(np.asarray(l_pp), np.asarray(l_ref),
                               rtol=2e-4, atol=2e-4)


def test_pp_scheduler_matches_plain():
    """BatchScheduler(pp_mesh=...) greedy output equals the plain
    scheduler's (pipeline-parallel serving path)."""
    import queue as _q

    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.engine.scheduler import BatchScheduler, Request
    from powerserve_tpu.models.loader import load_gguf_model
    from powerserve_tpu.parallel.pp import shard_params_pp
    from powerserve_tpu.tools.synthetic import make_synthetic_gguf
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        make_synthetic_gguf(td, "tiny", GGMLType.Q8_0, seed=0, seq_len=128)
        cfg, params = load_gguf_model(td + "/model")

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

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p2 = shard_params_pp(params, mesh, cfg.llm)
    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=128)
    pp_sched = BatchScheduler(p2, cfg, hp2, backend="xla", pp_mesh=mesh)
    assert pp_sched.decode_window  # pp ticks run the window loop now
    got = run_req(pp_sched, [3, 17, 5, 9])
    assert got == want, (got, want)

    # window-vs-carry equivalence on the pp tick itself
    import powerserve_tpu.engine.loops as L

    orig = L._DECODE_LOOP_DEFAULT
    L._DECODE_LOOP_DEFAULT = "carry"
    try:
        p3 = shard_params_pp(params, mesh, cfg.llm)
        carry_sched = BatchScheduler(p3, cfg, HyperParams(
            max_slots=2, batch_size=8, max_seq_len=128),
            backend="xla", pp_mesh=mesh)
        assert not carry_sched.decode_window
        got_c = run_req(carry_sched, [3, 17, 5, 9])
    finally:
        L._DECODE_LOOP_DEFAULT = orig
    assert got_c == want, (got_c, want)


def test_pp_paged_scheduler_matches_plain():
    """Pipeline stages + the paged pool together: layer-sliced pool
    slabs per stage, shared page table; greedy output (including a
    recompute preemption) equals the plain dense scheduler's."""
    import queue as _q
    import tempfile

    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.engine.scheduler import BatchScheduler, Request
    from powerserve_tpu.models.loader import load_gguf_model
    from powerserve_tpu.parallel.pp import shard_params_pp
    from powerserve_tpu.tools.synthetic import make_synthetic_gguf

    with tempfile.TemporaryDirectory() as td:
        make_synthetic_gguf(td, "tiny", GGMLType.Q8_0, seed=0, seq_len=128)
        cfg, params = load_gguf_model(td + "/model")

    def run_two(sched, prompts, n):
        outs = []
        for p in prompts:
            out, done = [], _q.Queue()

            def sink(t, out=out, done=done):
                done.put(True) if t is None else out.append(t)

            sched.submit(Request(prompt_ids=list(p), max_tokens=n,
                                 temperature=0.0, sink=sink))
            outs.append((out, done))
        for _ in range(600):
            if all(not d.empty() for _, d in outs):
                break
            sched.step()
        assert all(not d.empty() for _, d in outs)
        return [o for o, _ in outs]

    prompts = [list(range(3, 11)), list(range(40, 48))]
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64,
                     prefix_cache=0)
    plain = BatchScheduler(params, cfg, hp, backend="xla")
    want = run_two(plain, prompts, 10)
    plain.stop()

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p2 = shard_params_pp(params, mesh, cfg.llm)
    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=64,
                      prefix_cache=0, paged_pages=4, page_size=8)
    sched = BatchScheduler(p2, cfg, hp2, backend="xla", pp_mesh=mesh)
    got = run_two(sched, prompts, 10)
    sched.stop()
    assert got == want
    assert sched.n_preemptions >= 1  # pool pressure exercised under pp


def test_pp_mm_scheduler_matches_plain():
    """Multimodal (embedding-overlay) prefill through the pipeline:
    pp_forward's stage-0 overlay must reproduce the plain mm
    scheduler's greedy output exactly (VLM x pp composition)."""
    import queue as _q
    import tempfile

    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.engine.scheduler import BatchScheduler, Request
    from powerserve_tpu.models.loader import load_gguf_model
    from powerserve_tpu.parallel.pp import shard_params_pp
    from powerserve_tpu.tools.synthetic import make_synthetic_gguf

    with tempfile.TemporaryDirectory() as td:
        make_synthetic_gguf(td, "tiny", GGMLType.Q8_0, seed=0, seq_len=128)
        cfg, params = load_gguf_model(td + "/model")
    dim = cfg.llm.dim

    prompt = list(range(3, 11))
    rng = np.random.default_rng(5)
    embeds = rng.standard_normal((len(prompt), dim)).astype(np.float32)

    def run_req(sched):
        out, done = [], _q.Queue()

        def sink(t):
            done.put(True) if t is None else out.append(t)

        sched.submit(Request(prompt_ids=list(prompt), max_tokens=8,
                             temperature=0.0, embeds=embeds, sink=sink))
        for _ in range(400):
            if not done.empty():
                break
            sched.step()
        assert not done.empty()
        return out

    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64,
                     prefix_cache=0)
    plain = BatchScheduler(params, cfg, hp, backend="xla", mm_dim=dim)
    want = run_req(plain)
    plain.stop()

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p2 = shard_params_pp(params, mesh, cfg.llm)
    sched = BatchScheduler(p2, cfg, hp, backend="xla", mm_dim=dim,
                           pp_mesh=mesh)
    got = run_req(sched)
    sched.stop()
    assert got == want, (got, want)


def test_pp_eagle_scheduler_matches_plain():
    """EAGLE chain speculation x pipeline parallelism (r5): the verify
    runs through the staged pp_forward (features psum-replicated from
    the last stage) while the 1-layer head + its cache replicate —
    greedy output must equal the plain scheduler's (losslessness holds
    for ANY head weights; random head = worst-case acceptance)."""
    import dataclasses
    import queue as _q

    from powerserve_tpu.core.config import HyperParams
    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.engine.scheduler import BatchScheduler, Request
    from powerserve_tpu.models.loader import (
        _qlinear_from_float,
        load_gguf_model,
    )
    from powerserve_tpu.parallel.pp import shard_params_pp
    from powerserve_tpu.speculative.eagle import EagleParams
    from powerserve_tpu.tools.synthetic import make_synthetic_gguf
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        make_synthetic_gguf(td, "tiny", GGMLType.Q8_0, seed=0,
                            seq_len=128)
        cfg, params = load_gguf_model(td + "/model")
        make_synthetic_gguf(td + "/h", "tiny", GGMLType.Q8_0, seed=7,
                            seq_len=128)
        _, head = load_gguf_model(td + "/h/model")

    dim = cfg.llm.dim
    rng = np.random.default_rng(11)
    fc = _qlinear_from_float(
        rng.standard_normal((dim, 2 * dim)).astype(np.float32) * 0.05,
        GGMLType.Q8_0)
    lw0 = jax.tree_util.tree_map(lambda a: a[0], head.layers)
    ep = EagleParams(fc=fc, fc_bias=None, layers=(lw0,),
                     embed=params.embed, lm_head=params.lm_head,
                     out_norm=None, input_norm=False)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)

    def run_req(sched, prompt):
        out, done = [], _q.Queue()

        def sink(t):
            done.put(True) if t is None else out.append(t)

        sched.submit(Request(prompt_ids=prompt, max_tokens=8,
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

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p2 = shard_params_pp(params, mesh, cfg.llm)
    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=128)
    hp2.spec_k = 2
    sched = BatchScheduler(p2, cfg, hp2, backend="xla", pp_mesh=mesh,
                           eagle_params=ep, eagle_llm=e_llm)
    got = run_req(sched, [3, 17, 5, 9])
    assert got == want, (got, want)

    # EAGLE-2-style TREE template under pp: the verify threads
    # cache_positions + the ancestor intra_mask through the staged
    # pipeline (r5 pp_forward extension)
    hp3 = HyperParams(max_slots=2, batch_size=8, max_seq_len=128)
    hp3.spec_tree = "2,1"
    p3 = shard_params_pp(params, mesh, cfg.llm)
    sched3 = BatchScheduler(p3, cfg, hp3, backend="xla", pp_mesh=mesh,
                            eagle_params=ep, eagle_llm=e_llm)
    assert sched3.spec_template is not None
    got3 = run_req(sched3, [3, 17, 5, 9])
    assert got3 == want, (got3, want)
