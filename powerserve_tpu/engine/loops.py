"""Device-side multi-step decode loop.

Runs N greedy decode steps inside one jitted lax.scan — one host
round-trip per N tokens instead of per token. This both amortizes
dispatch latency (critical over remote-TPU links) and is the shape the
benchmark measures. Token feedback stays on device (argmax -> next
step's input), matching the reference's per-token greedy decode
semantics (llama_model.cpp:119-133) without its per-step host loop."""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig
from ..kv.cache import KVCache
from ..models.llama import LlamaParams, forward

# "window" keeps the KV cache loop-invariant inside the decode scan
# (in-flight steps live in a small carried window; one commit after the
# loop). MEASURED (8B Q4_K, T=1024, v5e): committing into the >=2^25-
# byte carried cache buffers inside the scan costs +2-3 ms/step (the
# L=32 cliff, .bench_lcurve.py / .bench_scanparts.py — XLA loses
# in-place aliasing on the carried operand); the window restores the
# linear 324 us/layer trend. "carry" is the legacy in-loop commit.
_DECODE_LOOP_DEFAULT = os.environ.get("POWERSERVE_DECODE_LOOP", "window")


@functools.partial(jax.jit,
                   static_argnames=("llm", "n_steps", "backend", "kv_update"),
                   donate_argnums=(2,))
def _decode_scan_carry(params: LlamaParams, tokens: jax.Array, kv: KVCache,
                       llm: LLMConfig, n_steps: int,
                       backend: str = "auto",
                       kv_update: str | None = None
                       ) -> tuple[jax.Array, KVCache]:
    """Legacy loop: the cache rides the scan carry and every step
    commits into it (pays the carried-scatter cliff at 8B sizes)."""

    def body(carry, _):
        tok, kv = carry
        pos = kv.pos.astype(jnp.int32)
        nxt, kv = forward(params, llm, kv, tok[:, None], pos[:, None],
                          backend=backend, logits_mode="argmax",
                          kv_update=kv_update)
        return (nxt, kv), nxt

    (_, kv), toks = jax.lax.scan(body, (tokens, kv), None, length=n_steps)
    return toks.T, kv


def make_kv_window(kv: KVCache, llm: LLMConfig, S: int,
                   n_steps: int) -> tuple:
    """Zeroed in-flight K/V window for `n_steps` decode steps:
    (wk [L,S,Hkv,W,D] int8, wv, wks [L,S,Hkv,W] f32, wvs)."""
    L = kv.k.shape[0]
    Hkv, D = llm.n_kv_heads, llm.head_size
    wk = jnp.zeros((L, S, Hkv, n_steps, D), kv.k.dtype)
    wks = jnp.zeros((L, S, Hkv, n_steps), kv.k_scale.dtype)
    return wk, jnp.zeros_like(wk), wks, jnp.zeros_like(wks)


def push_kv_window(wins: tuple, blk: tuple, i: jax.Array) -> tuple:
    """Write one step's new K/V blocks ([L,S,Hkv,1,(D)], forward's
    kv_update='window' 3rd output) into window lane i."""
    wk, wv, wks, wvs = wins
    kb, vb, ksb, vsb = blk
    at = (0, 0, 0, i, 0)
    return (jax.lax.dynamic_update_slice(wk, kb.astype(wk.dtype), at),
            jax.lax.dynamic_update_slice(wv, vb.astype(wv.dtype), at),
            jax.lax.dynamic_update_slice(wks, ksb.astype(wks.dtype),
                                         at[:4]),
            jax.lax.dynamic_update_slice(wvs, vsb.astype(wvs.dtype),
                                         at[:4]))


def commit_kv_lanes(kv: KVCache, wins: tuple, lane_pos: jax.Array,
                    lane_ok: jax.Array, pos_f: jax.Array,
                    mask_f: jax.Array) -> KVCache:
    """ONE scatter committing window lanes at EXPLICIT per-slot cache
    positions (in-place when kv is donated). lane_pos/lane_ok: [S, W]
    int32 positions / validity (dropped lanes and OOB positions are
    skipped). Valid lanes must hold unique positions per slot — scatter
    order with duplicate indices is undefined. Paged pools commit
    through the page table (locate's n_pages redirect drops invalid
    lanes)."""
    from ..kv.paged import PagedKVCache

    wk, wv, wks, wvs = wins
    ok = lane_ok & (lane_pos >= 0) & (lane_pos < kv.max_seq)
    safe = jnp.where(ok, lane_pos, kv.max_seq)
    mask = jax.vmap(lambda m, p: m.at[p].set(True, mode="drop"))(
        mask_f, safe)

    if isinstance(kv, PagedKVCache):
        pages, offs = kv.locate(jnp.where(ok, lane_pos, -1))  # [S, W]

        def commit_p(slab, new):
            # slab [L, P, H, page(, D)], new [L, S, H, W(, D)]
            vals = jnp.swapaxes(new, 2, 3)  # [L, S, W, H(, D)]
            return jax.vmap(PagedKVCache.scatter_slab,
                            in_axes=(0, 0, None, None))(
                slab, vals, pages, offs)

        return dataclasses.replace(
            kv, k=commit_p(kv.k, wk), v=commit_p(kv.v, wv),
            k_scale=commit_p(kv.k_scale, wks),
            v_scale=commit_p(kv.v_scale, wvs), mask=mask, pos=pos_f)

    def commit(cache, new, pos_s):
        return cache.at[:, :, pos_s].set(new.astype(cache.dtype),
                                         mode="drop")

    scat = jax.vmap(commit, in_axes=(1, 1, 0), out_axes=1)
    return dataclasses.replace(
        kv, k=scat(kv.k, wk, safe), v=scat(kv.v, wv, safe),
        k_scale=scat(kv.k_scale, wks, safe),
        v_scale=scat(kv.v_scale, wvs, safe), mask=mask, pos=pos_f)


def commit_kv_window(kv: KVCache, wins: tuple, pos0: jax.Array,
                     pos_f: jax.Array, mask_f: jax.Array,
                     active: jax.Array | None = None) -> KVCache:
    """Commit a sequential decode window: lane i of slot s goes to
    pos0[s]+i. pos_f/mask_f: the loop's final carried pos/mask. Slots
    outside `active` (and OOB lanes) are dropped."""
    W = wins[0].shape[3]
    wpos = pos0[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    ok = jnp.ones_like(wpos, bool) if active is None \
        else jnp.broadcast_to(active[:, None], wpos.shape)
    return commit_kv_lanes(kv, wins, wpos, ok, pos_f, mask_f)


def window_eligible(kv: KVCache, params: LlamaParams) -> bool:
    """kv_update='window' preconditions shared by the loops that route
    to it: quantized cache (dense OR paged pool — forward's paged
    deferred branch widens the state-mode flash kernel's in-flight
    partition with the window lanes, and commit_kv_lanes scatters
    through the page table), stacked-scan layers."""
    return (kv.quantized
            and not isinstance(params.layers, (tuple, list)))


@functools.partial(jax.jit,
                   static_argnames=("llm", "n_steps", "backend"),
                   donate_argnums=(2,))
def _decode_scan_window(params: LlamaParams, tokens: jax.Array,
                        kv: KVCache, llm: LLMConfig, n_steps: int,
                        backend: str = "auto"
                        ) -> tuple[jax.Array, KVCache]:
    """Window loop: the cache buffers stay LOOP-INVARIANT; each step's
    quantized K/V lands in a small [n_steps]-token carried window that
    attention reads as an extra visibility-masked softmax partition
    (forward kv_update="window"), and ONE post-loop scatter commits all
    steps x all layers. See _DECODE_LOOP_DEFAULT for the measured why."""
    S = tokens.shape[0]
    wins = make_kv_window(kv, llm, S, n_steps)
    pos0 = kv.pos.astype(jnp.int32)

    def body(carry, i):
        tok, pos, mask, wins = carry
        kvi = dataclasses.replace(kv, mask=mask, pos=pos)
        nxt, kvo, blk = forward(params, llm, kvi, tok[:, None],
                                pos.astype(jnp.int32)[:, None],
                                backend=backend, logits_mode="argmax",
                                kv_update="window",
                                inflight=wins + (i,))
        wins = push_kv_window(wins, blk, i)
        return (nxt, kvo.pos, kvo.mask, wins), nxt

    (_, pos_f, mask_f, wins), toks = jax.lax.scan(
        body, (tokens, kv.pos, kv.mask, wins), jnp.arange(n_steps))
    kv = commit_kv_window(kv, wins, pos0, pos_f, mask_f)
    return toks.T, kv


def decode_scan(params: LlamaParams, tokens: jax.Array, kv: KVCache,
                llm: LLMConfig, n_steps: int,
                backend: str = "auto",
                kv_update: str | None = None,
                loop: str | None = None) -> tuple[jax.Array, KVCache]:
    """Greedy-decode n_steps tokens for every slot.

    tokens: [S] int32 (current token per slot). Returns ([S, n_steps]
    generated tokens, updated kv). Routes to the window loop when
    eligible (dense int8 cache, stacked layers, default kv_update),
    else the legacy carry loop; `loop`/POWERSERVE_DECODE_LOOP override.
    """
    loop = loop or _DECODE_LOOP_DEFAULT
    if (loop == "window" and kv_update in (None, "auto", "window")
            and window_eligible(kv, params)):
        return _decode_scan_window(params, tokens, kv, llm, n_steps,
                                   backend)
    return _decode_scan_carry(params, tokens, kv, llm, n_steps, backend,
                              kv_update)


@functools.partial(jax.jit,
                   static_argnames=("llm", "backend", "kv_update"),
                   donate_argnums=(3,))
def prefill_step(params: LlamaParams, tokens: jax.Array,
                 positions: jax.Array, kv: KVCache, llm: LLMConfig,
                 backend: str = "auto",
                 kv_update: str | None = None) -> tuple[jax.Array, KVCache]:
    """One prefill chunk: tokens/positions [S, T]."""
    return forward(params, llm, kv, tokens, positions, backend=backend,
                   logits_mode="last", kv_update=kv_update)
