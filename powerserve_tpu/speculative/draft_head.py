"""Factored (low-rank) DRAFT logits head.

The measured EAGLE/chain bottleneck on TPU is not the draft model — it
is the draft's OWN lm_head: every drafted token pays a full [dim,
vocab] quantized read (~295 MB on an 8B Llama-3 vocab, 0.7-2.6 ms
measured in-scan, .bench_eagle_ablate.py), while the 1-layer EAGLE
head / layer-skip layers are nearly free. This module factors the
lm_head once at load time:

    logits_draft = (xh @ U) @ V,   U [dim, r],  V [r, vocab]

via randomized SVD (Halko et al. 2011), with V re-quantized to int8
per-32-block scales — at r=512 the per-draft read drops to ~70 MB
(4x; U adds 0.5 MB).

LOSSLESSNESS: the emitted stream is unchanged in distribution. Greedy
exact-match acceptance compares drafts against the target's argmax
(any draft source is sound); stochastic rejection sampling accepts
with min(1, p/q) where q is the distribution the draft ACTUALLY
sampled from — the factored head's q — so the marginals remain exactly
the target's (chain.py docstring). The only cost is ACCEPTANCE RATE:
a rank-r head proposes slightly worse drafts. That tradeoff is
empirical per checkpoint; `powerserve-tpu gate` measures it.

TUNNEL-FRIENDLY BY CONSTRUCTION: the dequantized lm_head (2 GB f32)
never leaves the device, V is quantized ON DEVICE, and the host only
sees the [dim, r+p] range (9 MB), a [r+p, r+p] Gram matrix, and the
tiny U factor — a remote-TPU link ships megabytes, not the 280 MB
projection (the first implementation stalled >35 min on exactly that;
it also avoids jnp.linalg.qr on the tunnel backend entirely).

Reference n/a (the reference's draft is a full small model,
spec_model.hpp); the factored head is a TPU-first answer to the
bandwidth arithmetic above.
"""

from __future__ import annotations

import numpy as np

from ..core.gguf import GGMLType
from ..ops.qmatmul import QK, QLinear

__all__ = ["make_draft_head"]


def make_draft_head(lm_head: QLinear, rank: int = 512,
                    oversample: int = 32, seed: int = 0,
                    u_quant: int = GGMLType.Q8_0
                    ) -> tuple[QLinear, QLinear]:
    """Factor a [dim, vocab] QLinear into (U [dim, r], V [r, vocab]).

    rank must be a multiple of 32 (V's int8 per-block scales)."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..ops.qmatmul import _dequant_full

    assert rank % QK == 0, f"rank {rank} must be a multiple of {QK}"
    dim, vocab = lm_head.in_features, lm_head.out_features
    r, p = rank, oversample
    rng = np.random.default_rng(seed)

    @jax.jit
    def sketch(lin, g):
        w = _dequant_full(lin, jnp.float32)  # [dim, vocab], stays in HBM
        return w @ g  # [dim, r+p]

    g = jnp.asarray(rng.standard_normal((vocab, r + p)).astype(np.float32)
                    / np.sqrt(vocab))
    y = np.asarray(sketch(lm_head, g))  # 9 MB fetch
    q, _ = np.linalg.qr(y)  # host QR of [dim, r+p]

    @jax.jit
    def gram(lin, q):
        w = _dequant_full(lin, jnp.float32)
        b = q.T @ w  # [r+p, vocab]
        return b @ b.T  # [r+p, r+p]

    qd = jnp.asarray(q.astype(np.float32))
    c = np.asarray(gram(lm_head, qd))  # tiny fetch
    # B = Ub S Vt  =>  C = B B^T = Ub S^2 Ub^T (eigh ascending -> flip)
    evals, evecs = np.linalg.eigh(c)
    ub = evecs[:, ::-1][:, :r]  # [r+p, r]
    u = (q @ ub).astype(np.float32)  # [dim, r]

    @functools.partial(jax.jit, static_argnames=())
    def project_quantize(lin, q, ub):
        w = _dequant_full(lin, jnp.float32)
        v = ub.T @ (q.T @ w)  # [r, vocab] = S Vt up to sign
        # device-side symmetric int8 quantization, per-32 K blocks
        vb = v.reshape(r // QK, QK, vocab)
        s = jnp.max(jnp.abs(vb), axis=1) / 127.0  # [r/32, vocab]
        qi = jnp.round(vb / jnp.maximum(s, 1e-12)[:, None, :])
        qi = jnp.clip(qi, -127, 127).astype(jnp.int8).reshape(r, vocab)
        return qi, s.astype(jnp.float32)

    qi, s = project_quantize(lm_head, qd, jnp.asarray(ub, jnp.float32))
    v_lin = QLinear(q=qi, scales=s, bias=None, packed=False,
                    unsigned=False, in_features=r, out_features=vocab,
                    pack_group=0, scale_group=QK)
    return QLinear.from_float(u, u_quant), v_lin
