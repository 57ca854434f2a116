"""ops/fused.py: fused prologue/epilogue matmul chain vs the unfused
op composition (interpret-mode kernel vs XLA fallback)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.ops.fused import fusable, fused_linear
from powerserve_tpu.ops.qmatmul import QLinear

K, N = 1024, 1536
rng = np.random.default_rng(7)


def _lin(k=K, n=N, t=GGMLType.Q4_K):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    return QLinear.from_float(w, t)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


@pytest.mark.parametrize("gtype", [GGMLType.Q4_K, GGMLType.Q4_0,
                                   GGMLType.Q8_0])
@pytest.mark.parametrize("m", [1, 8])
def test_plain_x(gtype, m):
    lin = _lin(t=gtype)
    x = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32))
    a = fused_linear(lin, x=x, backend="pallas_interpret")
    b = fused_linear(lin, x=x, backend="xla")
    assert a.shape == (m, N)
    assert _rel(a, b) < 2e-2


def test_norm_bias_resid():
    lin = _lin()
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    br = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    nw = jnp.asarray(rng.standard_normal((K,)).astype(np.float32) * .1 + 1)
    bias = jnp.asarray(rng.standard_normal((N,)).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((1, N)).astype(np.float32))
    kw = dict(norm=(x, br, nw), bias=bias, resids=(res,))
    a = fused_linear(lin, backend="pallas_interpret", **kw)
    b = fused_linear(lin, backend="xla", **kw)
    assert _rel(a, b) < 2e-2


def test_glu():
    lin = _lin()
    gu = jnp.asarray(rng.standard_normal((1, 2 * K)).astype(np.float32))
    a = fused_linear(lin, glu=gu, backend="pallas_interpret")
    b = fused_linear(lin, glu=gu, backend="xla")
    assert _rel(a, b) < 2e-2


def test_concat2():
    lin = _lin()
    xa = jnp.asarray(rng.standard_normal((1, K // 2)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((1, K // 2)).astype(np.float32))
    a = fused_linear(lin, parts=(xa, xb), backend="pallas_interpret")
    b = fused_linear(lin, parts=(xa, xb), backend="xla")
    assert _rel(a, b) < 2e-2


@pytest.mark.parametrize("m", [1, 5, 8])
def test_argmax_matches_logits(m):
    lin = _lin(k=512, n=2048, t=GGMLType.Q8_0)
    x = jnp.asarray(rng.standard_normal((m, 512)).astype(np.float32))
    tok = np.asarray(fused_linear(lin, x=x, argmax=True,
                                  backend="pallas_interpret"))
    logits = np.asarray(fused_linear(lin, x=x,
                                     backend="pallas_interpret"))
    assert tok.shape == (m,) and tok.dtype == np.int32
    assert (tok == logits.argmax(-1)).all()


def test_argmax_tie_first_occurrence():
    # identical columns -> jnp.argmax picks the first; the kernel's
    # per-tile min-index + strict cross-tile max must match
    n = 512
    w = rng.standard_normal((64, n)).astype(np.float32)
    w[:, 300] = w[:, 10]  # duplicate the eventual max column
    mx = np.abs(w).max()
    w[:, 10] = mx + 1.0
    w[:, 300] = mx + 1.0
    lin = QLinear.from_float(w, GGMLType.Q8_0)
    x = jnp.ones((1, 64), jnp.float32)
    tok = np.asarray(fused_linear(lin, x=x, argmax=True,
                                  backend="pallas_interpret"))
    ref = np.asarray(fused_linear(lin, x=x,
                                  backend="pallas_interpret")).argmax(-1)
    assert (tok == ref).all()


def test_stacked_layer_prefetch():
    L = 3
    lins = [_lin() for _ in range(L)]
    stack = dataclasses.replace(
        lins[0], q=jnp.stack([l.q for l in lins]),
        scales=jnp.stack([l.scales for l in lins]),
        bias=jnp.stack([l.bias for l in lins]))
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    nws = jnp.asarray(rng.standard_normal((L, K)).astype(np.float32) * .1
                      + 1)
    for li in range(L):
        a = fused_linear(stack, norm=(x, nws), layer=jnp.int32(li),
                         backend="pallas_interpret")
        b = fused_linear(lins[li], norm=(x, nws[li]), backend="xla")
        assert _rel(a, b) < 2e-2, li


def test_fusable_gates():
    assert fusable(_lin(), 1)
    assert not fusable(_lin(), 32)  # prefill M
    odd = _lin(n=N)
    odd = dataclasses.replace(odd, out_features=N - 64)
    assert not fusable(odd, 1)  # N not 128-aligned
    big = dataclasses.replace(_lin(), in_features=32768)
    assert not fusable(big, 1)  # K beyond the single-tile budget
