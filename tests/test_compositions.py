"""Serving-mode COMPOSITION tests (VERDICT r2 item 5): speculation x
pipeline parallelism and VLM-embeds x speculation, both previously
asserted out of BatchScheduler. Greedy speculation is lossless, so
every composition must reproduce the plain single-device token stream.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.engine.scheduler import BatchScheduler, Request
from powerserve_tpu.parallel.mesh import make_mesh
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS

PRESETS.setdefault("compo", dict(dim=256, ffn=512, layers=2, heads=8,
                                 kv_heads=4, vocab=512, arch="llama",
                                 bias=False))

PROMPTS = [[3, 5, 7, 9, 11], [101, 7, 42]]


@pytest.fixture(scope="module")
def model():
    return make_device_params("compo", quant="q8_0")


@pytest.fixture(scope="module")
def draft_model():
    # separate 2-layer draft (different seed): spec x pp needs a real
    # second model — self-draft layer truncation breaks stage layout
    cfg, params = make_device_params("compo", quant="q8_0", seed=7)
    return cfg, params


def _run(sched, prompts, max_tokens=8, timeout=240, **req_kw):
    sched.start()
    outs, dones = [], []
    for p in prompts:
        done = threading.Event()
        out = []

        def sink(t, out=out, done=done):
            if t is None:
                done.set()
            else:
                out.append(t)

        sched.submit(Request(prompt_ids=list(p), max_tokens=max_tokens,
                             temperature=0.0, sink=sink, **req_kw))
        outs.append(out)
        dones.append(done)
    for d in dones:
        assert d.wait(timeout=timeout), "request did not finish"
    return outs


@pytest.fixture(scope="module")
def ref_tokens(model):
    cfg, params = model
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    s = BatchScheduler(params, cfg, hp, backend="xla")
    try:
        return _run(s, PROMPTS)
    finally:
        s.stop()


def test_spec_chain_x_pp_matches_plain(model, draft_model, ref_tokens):
    """Chain speculation through the staged pipeline (pp=2): greedy
    spec == vanilla greedy, now with both models' layers sharded over
    pp and the whole draft->verify scan running pp_forward."""
    from powerserve_tpu.parallel.pp import shard_params_pp

    cfg, params = model
    d_cfg, d_params = draft_model
    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    tp = shard_params_pp(params, mesh, cfg.llm)
    dp = shard_params_pp(d_params, mesh, d_cfg.llm)
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    s = BatchScheduler(tp, cfg, hp, backend="xla", pp_mesh=mesh,
                       draft_params=dp, draft_llm=d_cfg.llm, spec_k=2)
    try:
        got = _run(s, PROMPTS)
    finally:
        s.stop()
    assert got == ref_tokens


def test_spec_pp_rejects_tree_and_self_draft(model, draft_model):
    from powerserve_tpu.parallel.pp import shard_params_pp
    from powerserve_tpu.speculative.chain import self_draft_config

    cfg, params = model
    d_cfg, d_params = draft_model
    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    tp = shard_params_pp(params, mesh, cfg.llm)
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    with pytest.raises(AssertionError):
        BatchScheduler(tp, cfg, hp, backend="xla", pp_mesh=mesh,
                       draft_params=tp,
                       draft_llm=self_draft_config(cfg.llm, 1))
    hp2 = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp2.spec_tree = "2,2"
    dpp = shard_params_pp(d_params, mesh, d_cfg.llm)
    with pytest.raises(AssertionError):
        BatchScheduler(tp, cfg, hp2, backend="xla", pp_mesh=mesh,
                       draft_params=dpp, draft_llm=d_cfg.llm)


def test_mm_embeds_x_spec_chain_matches_plain(model, ref_tokens):
    """VLM-style embed requests on a SPEC scheduler: real embedding
    rows as Request.embeds through both prefills == plain greedy."""
    from powerserve_tpu.speculative.chain import self_draft_config

    cfg, params = model
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    s = BatchScheduler(params, cfg, hp, backend="xla",
                       draft_params=params,
                       draft_llm=self_draft_config(cfg.llm, 1),
                       spec_k=2, mm_dim=cfg.llm.dim)
    try:
        embeds = np.asarray(
            params.embed.lookup(jnp.asarray([PROMPTS[0]], jnp.int32))[0],
            np.float32)
        got_mm = _run(s, [PROMPTS[0]], embeds=embeds)
        got_text = _run(s, [PROMPTS[1]])  # text tick on the same sched
    finally:
        s.stop()
    assert got_mm[0] == ref_tokens[0]
    assert got_text[0] == ref_tokens[1]


def test_mm_embeds_x_spec_tree_matches_plain(model, ref_tokens):
    from powerserve_tpu.speculative.chain import self_draft_config

    cfg, params = model
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    hp.spec_tree = "2,2"
    s = BatchScheduler(params, cfg, hp, backend="xla",
                       draft_params=params,
                       draft_llm=self_draft_config(cfg.llm, 1),
                       mm_dim=cfg.llm.dim)
    try:
        embeds = np.asarray(
            params.embed.lookup(jnp.asarray([PROMPTS[0]], jnp.int32))[0],
            np.float32)
        got = _run(s, [PROMPTS[0]], embeds=embeds)
    finally:
        s.stop()
    assert got[0] == ref_tokens[0]


def test_mm_embeds_x_eagle(model):
    """VLM x EAGLE: embed requests must run and match the same
    scheduler's plain-token output for an identical stream (the head
    drafts from features and is ARBITRARY here — lossless verification
    makes the emitted stream head-independent under greedy)."""
    import dataclasses

    from powerserve_tpu.ops.qmatmul import QLinear
    from powerserve_tpu.speculative.eagle import EagleParams

    cfg, params = model
    dim = cfg.llm.dim
    rng = np.random.default_rng(3)
    lw0 = jax.tree.map(lambda a: a[0], params.layers)
    eparams = EagleParams(
        fc=QLinear.from_float(
            rng.standard_normal((2 * dim, dim)).astype(np.float32) * 0.05),
        fc_bias=None, layers=(lw0,), embed=params.embed,
        lm_head=params.lm_head, out_norm=params.out_norm,
        input_norm=True)
    e_llm = dataclasses.replace(cfg.llm, n_layers=1)
    hp = HyperParams(max_slots=2, batch_size=8, max_seq_len=64)
    s = BatchScheduler(params, cfg, hp, backend="xla",
                       eagle_params=eparams, eagle_llm=e_llm,
                       mm_dim=cfg.llm.dim)
    try:
        ref = _run(s, [PROMPTS[0]])
        embeds = np.asarray(
            params.embed.lookup(jnp.asarray([PROMPTS[0]], jnp.int32))[0],
            np.float32)
        got = _run(s, [PROMPTS[0]], embeds=embeds)
    finally:
        s.stop()
    assert got[0] == ref[0]
