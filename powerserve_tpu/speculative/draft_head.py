"""Factored (low-rank) DRAFT logits head.

The measured EAGLE/chain bottleneck on TPU is not the draft model — it
is the draft's OWN lm_head: every drafted token pays a full [dim,
vocab] quantized read (~295 MB on an 8B Llama-3 vocab, 0.7-2.6 ms
measured in-scan, .bench_eagle_ablate.py), while the 1-layer EAGLE
head / layer-skip layers are nearly free. This module factors the
lm_head once at load time:

    logits_draft = (xh @ U) @ V,   U [dim, r],  V [r, vocab]

via randomized SVD (Halko et al. 2011), with V re-quantized to Q4_K —
at r=512 the per-draft read drops to ~41 MB (7x).

LOSSLESSNESS: the emitted stream is unchanged in distribution. Greedy
exact-match acceptance compares drafts against the target's argmax
(any draft source is sound); stochastic rejection sampling accepts
with min(1, p/q) where q is the distribution the draft ACTUALLY
sampled from — the factored head's q — so the marginals remain exactly
the target's (chain.py docstring). The only cost is ACCEPTANCE RATE:
a rank-r head proposes slightly worse drafts. That tradeoff is
empirical per checkpoint; `powerserve-tpu gate` measures it.

Reference n/a (the reference's draft is a full small model,
spec_model.hpp); the factored head is a TPU-first answer to the
bandwidth arithmetic above.
"""

from __future__ import annotations

import numpy as np

from ..core.gguf import GGMLType
from ..ops.qmatmul import QLinear

__all__ = ["make_draft_head"]


def make_draft_head(lm_head: QLinear, rank: int = 512,
                    oversample: int = 32, seed: int = 0,
                    v_quant: int = GGMLType.Q4_K,
                    u_quant: int = GGMLType.Q8_0
                    ) -> tuple[QLinear, QLinear]:
    """Factor a [dim, vocab] QLinear into (U [dim, r], V [r, vocab]).

    Runs the randomized range finder on DEVICE (the dequantized lm_head
    never leaves HBM; only the [dim, r+p] range and the [r+p, vocab]
    projection are fetched) and the small SVD on host. rank must
    satisfy the quantizer's K constraints (Q4_K: rank % 256 == 0)."""
    import jax
    import jax.numpy as jnp

    from ..ops.qmatmul import _dequant_full

    dim, vocab = lm_head.in_features, lm_head.out_features
    r, p = rank, oversample
    rng = np.random.default_rng(seed)

    @jax.jit
    def range_and_project(lin_q, lin_s, lin_b, g):
        import dataclasses as _dc

        lin = _dc.replace(lm_head, q=lin_q, scales=lin_s, bias=lin_b)
        w = _dequant_full(lin, jnp.float32)  # [dim, vocab]
        y = w @ g  # [dim, r+p]
        q, _ = jnp.linalg.qr(y)
        b = q.T @ w  # [r+p, vocab]
        return q, b

    g = jnp.asarray(rng.standard_normal((vocab, r + p)), jnp.float32)
    q, b = range_and_project(lm_head.q, lm_head.scales, lm_head.bias, g)
    q = np.asarray(q)
    b = np.asarray(b)
    # small SVD on host: W ~ Q @ B, B = Ub S Vt
    ub, s, vt = np.linalg.svd(b, full_matrices=False)
    u = (q @ ub[:, :r]).astype(np.float32)  # [dim, r]
    v = (s[:r, None] * vt[:r]).astype(np.float32)  # [r, vocab]
    return (QLinear.from_float(u, u_quant),
            QLinear.from_float(v, v_quant))
