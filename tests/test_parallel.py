"""Sharding tests on the virtual 8-device CPU mesh: sharded forward
equals single-device forward; KV/params get the intended shardings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from powerserve_tpu.kv import KVCache
from powerserve_tpu.models.llama import forward
from powerserve_tpu.parallel import make_mesh, shard_kv, shard_params
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS

PRESETS.setdefault("ptest", dict(dim=256, ffn=512, layers=2, heads=8,
                                 kv_heads=8, vocab=512, arch="llama",
                                 bias=False))


@pytest.fixture(scope="module")
def model():
    cfg, params = make_device_params("ptest", quant="q4_k")
    return cfg, params


def _run(params, cfg, kv, mesh=None):
    tokens = jnp.asarray([[3, 5, 7, 9]])
    tokens = jnp.broadcast_to(tokens, (kv.n_slots, 4))
    pos = jnp.broadcast_to(jnp.arange(4)[None, :], (kv.n_slots, 4))

    @jax.jit
    def step(params, kv):
        return forward(params, cfg.llm, kv, tokens, pos, backend="xla",
                       logits_mode="last")

    if mesh is not None:
        with mesh:
            logits, kv = step(params, kv)
    else:
        logits, kv = step(params, kv)
    return np.asarray(logits), kv


def test_sharded_forward_matches_single(model):
    cfg, params = model
    llm = cfg.llm
    kv0 = KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads, llm.head_size)
    ref, _ = _run(params, cfg, kv0)

    mesh = make_mesh({"dp": 2, "tp": 4})
    p2 = shard_params(params, mesh)
    kv2 = shard_kv(KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads,
                                  llm.head_size), mesh)
    got, kv2 = _run(p2, cfg, kv2, mesh)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_shardings_applied(model):
    cfg, params = model
    mesh = make_mesh({"dp": 2, "tp": 4})
    p2 = shard_params(params, mesh)
    # column-parallel fused qkv: last axis sharded over tp
    lw = p2.layers
    spec = lw.wqkv.q.sharding.spec
    assert spec[-1] == "tp", spec
    # row-parallel down proj: K axis sharded
    spec = lw.w_down.q.sharding.spec
    assert spec[-2] == "tp", spec
    llm = cfg.llm
    kv = shard_kv(KVCache.create(llm.n_layers, 4, 16, llm.n_kv_heads,
                                 llm.head_size), mesh)
    # [L, S, H, T, D]: heads axis 2 over tp, slots axis 1 over dp
    assert kv.k.sharding.spec[2] == "tp"
    assert kv.k.sharding.spec[1] == "dp"


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.shape["tp"] == len(jax.devices())
    assert mesh.shape["dp"] == 1
