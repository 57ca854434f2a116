"""MoE grouped top-k dispatch: sort (token, expert) assignments by
expert and pad each expert's segment to the matmul M tile, so one
grouped qmatmul call (ops/qmatmul.py:qmatmul_grouped) computes only the
routed pairs — E/k fewer FLOPs than dense-all-experts at prefill — and
each M tile's scalar-prefetch index reads only its expert's quantized
slab from HBM.

TPU-first version of the reference's mul_mat_id expert matmuls
(reference libs/ggml/src/ggml.c ggml_mul_mat_id): static shapes
(capacity = assignments + one pad tile per expert, so NOTHING is ever
dropped — exact numerics), sort + scatter instead of per-row pointer
chasing, expert-parallel friendly (non-local assignments get weight 0
and land in a drop bucket).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def group_dispatch(topi: jax.Array, topw: jax.Array, n_local: int,
                   e_off: jax.Array | int, block_m: int
                   ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Build the sorted+padded grouped-matmul layout for one MoE layer.

    topi/topw: [N, k] routed expert ids (GLOBAL) and renormalized
    weights. n_local: experts owned by this shard; e_off: this shard's
    first global expert id (0 unless expert-parallel). block_m: the
    grouped matmul's M tile — every expert's segment is padded to a
    multiple of it.

    Returns (tok [P], w [P], tile_e [P // block_m]):
      tok: source token row per padded slot (-1 for padding),
      w:   routing weight per slot (0 for padding / non-local),
      tile_e: LOCAL expert id owning each M tile (dead tiles point at
      the last local expert; their rows carry w=0 so any slab is safe).
    P is static: round_up(N*k, block_m) + min(N*k, n_local) * block_m
    bounds sum_e round_up(count_e, block_m) for any routing (at most
    min(N*k, n_local) experts have count_e > 0, each contributing at
    most count_e + block_m - 1 padded rows), so no assignment is ever
    dropped. The min() matters at DECODE M: with N*k << n_local (e.g.
    qwen3moe E=128, S=8 x top-8 = 64 assignments) the old n_local
    bound forced one tile per expert — as many weight-slab reads as
    dense-all-experts; the tight bound reads at most
    ceil(a/bm) + min(a, n_local) slabs.
    """
    n, k = topi.shape
    a = n * k
    bm = int(block_m)
    p = round_up(a, bm) + min(a, n_local) * bm
    e_flat = topi.reshape(-1).astype(jnp.int32) - e_off
    w_flat = topw.reshape(-1).astype(jnp.float32)
    tok = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    local = (e_flat >= 0) & (e_flat < n_local)
    # non-local assignments sort into a trailing bucket and scatter-drop
    key = jnp.where(local, e_flat, n_local)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    tok_s = tok[order]
    w_s = jnp.where(local, w_flat, 0.0)[order]
    counts = jnp.zeros((n_local + 1,), jnp.int32).at[key].add(1)
    seg_start = jnp.cumsum(counts) - counts  # sorted segment starts
    padded = (counts[:n_local] + bm - 1) // bm * bm
    pad_start = jnp.cumsum(padded) - padded  # padded segment starts
    rank = jnp.arange(a, dtype=jnp.int32) - seg_start[key_s]
    dst = jnp.where(key_s < n_local,
                    pad_start[jnp.minimum(key_s, n_local - 1)] + rank, p)
    tok_p = jnp.full((p,), -1, jnp.int32).at[dst].set(tok_s, mode="drop")
    w_p = jnp.zeros((p,), jnp.float32).at[dst].set(w_s, mode="drop")
    pad_end = jnp.cumsum(padded)
    tile_e = jnp.searchsorted(pad_end,
                              jnp.arange(p // bm, dtype=jnp.int32) * bm,
                              side="right").astype(jnp.int32)
    tile_e = jnp.minimum(tile_e, n_local - 1)
    return tok_p, w_p, tile_e


def combine(y: jax.Array, tok: jax.Array, w: jax.Array, n_tokens: int
            ) -> jax.Array:
    """Scatter-add expert outputs back to token rows, weighted.

    y: [P, dim] grouped-matmul output; tok/w from group_dispatch.
    Padding rows (tok == -1) redirect out of bounds and drop.
    """
    out = jnp.zeros((n_tokens, y.shape[-1]), jnp.float32)
    safe = jnp.where(tok >= 0, tok, n_tokens)
    return out.at[safe].add(y.astype(jnp.float32) * w[:, None],
                            mode="drop")
