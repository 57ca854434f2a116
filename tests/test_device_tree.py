"""On-device batched tree speculation (speculative/device_tree.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.speculative.device_tree import (
    DeviceTreeEngine,
    TreeTemplate,
    tree_spec_scan,
)
from powerserve_tpu.speculative.engine import SpecStats
from powerserve_tpu.tools.bench_params import make_device_params


def _vanilla_greedy(params, cfg, prompt, n):
    """Greedy reference with the SAME prefill split as the spec engines
    (prefill prompt[:-1], feed the root Tq=1): batching the root into
    the prefill chunk instead changes float accumulation order enough to
    flip near-tied argmaxes on a random tiny model."""
    from powerserve_tpu.models.llama import forward

    llm = cfg.llm
    kv = KVCache.create(llm.n_layers, 1, llm.seq_len, llm.n_kv_heads,
                        llm.head_size, dtype="bf16")
    pos = jnp.arange(len(prompt) - 1, dtype=jnp.int32)[None, :]
    _, kv = forward(params, llm, kv, jnp.asarray([prompt[:-1]]), pos,
                    backend="xla", logits_mode="none")
    cur = prompt[-1]
    out = []
    for i in range(n):
        p = len(prompt) - 1 + i
        logits, kv = forward(params, llm, kv, jnp.asarray([[cur]]),
                             jnp.asarray([[p]], jnp.int32),
                             backend="xla", logits_mode="last")
        cur = int(np.argmax(np.asarray(logits)[0]))
        out.append(cur)
    return out


def test_template_topology():
    t = TreeTemplate.from_widths([2, 1])
    # root + 2 children + 2 grandchildren
    assert t.n_nodes == 5
    assert t.parents == [-1, 0, 0, 1, 2]
    assert t.ranks == [0, 0, 1, 0, 0]
    assert t.max_depth == 2
    assert [list(l) for l in t.levels] == [[0], [1, 2], [3, 4]]
    # chain is the width-1 special case
    c = TreeTemplate.from_widths([1, 1, 1])
    assert c.n_nodes == 4 and c.max_depth == 3
    np.testing.assert_array_equal(c.child_table[:, 0], [1, 2, 3, -1])
    # ancestor-or-self is reflexive + transitive up
    assert t.anc[3, 3] and t.anc[3, 1] and t.anc[3, 0]
    assert not t.anc[3, 2] and not t.anc[1, 2]


def test_template_validation():
    with pytest.raises(ValueError):
        TreeTemplate([0], [0])  # root must have parent -1
    with pytest.raises(ValueError):
        TreeTemplate([-1, 1], [0, 0])  # parent after child
    with pytest.raises(ValueError):
        TreeTemplate([-1, 0, 0], [0, 2])  # wrong length/ranks


@pytest.mark.parametrize("widths", [[1, 1, 1], [2, 2, 1]])
def test_tree_spec_greedy_matches_vanilla(widths):
    """Tree speculation is lossless under greedy verify, for chains and
    real trees, any draft quality."""
    cfg, params = make_device_params("tiny", "q8_0")
    prompt = [3, 17, 5, 9]
    want = _vanilla_greedy(params, cfg, prompt, 24)

    d_cfg, d_params = make_device_params("tiny", "q8_0", seed=7)
    cases = [
        dict(self_draft_layers=cfg.llm.n_layers),
        dict(self_draft_layers=max(cfg.llm.n_layers // 2, 1)),
        dict(draft_params=d_params, draft_cfg=d_cfg),
    ]
    tpl = TreeTemplate.from_widths(widths)
    for kw in cases:
        spec = DeviceTreeEngine(params, cfg, template=tpl, block_steps=4,
                                backend="xla", kv_dtype="bf16", **kw)
        got = list(spec.generate(prompt, 24))
        assert got == want, (widths, kw, got, want)


def test_tree_full_self_draft_accepts_deepest_path():
    """Draft == target: the argmax path through the tree is always
    accepted, so every step emits max_depth + 1 tokens."""
    cfg, params = make_device_params("tiny", "q8_0")
    tpl = TreeTemplate.from_widths([2, 1, 1])
    spec = DeviceTreeEngine(params, cfg,
                            self_draft_layers=cfg.llm.n_layers,
                            template=tpl, block_steps=4, backend="xla",
                            kv_dtype="bf16")
    stats = SpecStats()
    out = list(spec.generate([3, 17, 5], 16, stats=stats))
    assert len(out) == 16
    assert stats.tokens_per_step == tpl.max_depth + 1  # 4 tok/step


def test_tree_spec_batched_active_mask():
    """Inactive slots: counts 0, kv untouched, root unchanged."""
    cfg, params = make_device_params("tiny", "q8_0")
    llm = cfg.llm
    S = 2
    tpl = TreeTemplate.from_widths([2, 1])
    t_kv = KVCache.create(llm.n_layers, S, llm.seq_len, llm.n_kv_heads,
                          llm.head_size, "bf16")
    d_kv = KVCache.create(llm.n_layers, S, llm.seq_len, llm.n_kv_heads,
                          llm.head_size, "bf16")
    from powerserve_tpu.engine.loops import prefill_step

    prompt = np.asarray([[3, 17, 5, 9]] * S, np.int32)
    pos = np.broadcast_to(np.arange(4, dtype=np.int32), (S, 4))
    _, t_kv = prefill_step(params, jnp.asarray(prompt), jnp.asarray(pos),
                           t_kv, llm, "xla")
    _, d_kv = prefill_step(params, jnp.asarray(prompt), jnp.asarray(pos),
                           d_kv, llm, "xla")
    root = jnp.asarray([9, 9], jnp.int32)
    active = jnp.asarray([True, False])
    emitted, counts, t_kv2, d_kv2, root2, _ = tree_spec_scan(
        params, params, t_kv, d_kv, root, llm, llm, 2, tpl.key(), "xla",
        active=active)
    counts = np.asarray(counts)
    assert (counts[:, 0] >= 1).all()
    assert (counts[:, 1] == 0).all()
    assert int(np.asarray(t_kv2.pos)[1]) == 4  # inactive slot unchanged
    assert int(np.asarray(root2)[1]) == 9
    # active slot committed exactly what it emitted
    total = int(counts[:, 0].sum())
    assert int(np.asarray(t_kv2.pos)[0]) == 4 + total
    assert int(np.asarray(d_kv2.pos)[0]) == 4 + total
