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
        logits, kv = forward(params, llm, kv, tok[:, None], pos[:, None],
                             backend=backend, logits_mode="last",
                             kv_update=kv_update)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, kv), nxt

    (_, kv), toks = jax.lax.scan(body, (tokens, kv), None, length=n_steps)
    return toks.T, kv


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
    L = kv.k.shape[0]
    S = tokens.shape[0]
    Hkv, D = llm.n_kv_heads, llm.head_size
    W = n_steps
    wk = jnp.zeros((L, S, Hkv, W, D), kv.k.dtype)
    wv = jnp.zeros_like(wk)
    wks = jnp.zeros((L, S, Hkv, W), kv.k_scale.dtype)
    wvs = jnp.zeros_like(wks)
    pos0 = kv.pos.astype(jnp.int32)

    def body(carry, i):
        tok, pos, mask, wk, wv, wks, wvs = carry
        kvi = dataclasses.replace(kv, mask=mask, pos=pos)
        logits, kvo, blk = forward(params, llm, kvi, tok[:, None],
                                   pos.astype(jnp.int32)[:, None],
                                   backend=backend, logits_mode="last",
                                   kv_update="window",
                                   inflight=(wk, wv, wks, wvs, i))
        kb, vb, ksb, vsb = blk  # [L, S, Hkv, 1, (D)]
        at = (0, 0, 0, i, 0)
        wk = jax.lax.dynamic_update_slice(wk, kb.astype(wk.dtype), at)
        wv = jax.lax.dynamic_update_slice(wv, vb.astype(wv.dtype), at)
        wks = jax.lax.dynamic_update_slice(wks, ksb.astype(wks.dtype),
                                           at[:4])
        wvs = jax.lax.dynamic_update_slice(wvs, vsb.astype(wvs.dtype),
                                           at[:4])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, kvo.pos, kvo.mask, wk, wv, wks, wvs), nxt

    (_, pos_f, mask_f, wk, wv, wks, wvs), toks = jax.lax.scan(
        body, (tokens, kv.pos, kv.mask, wk, wv, wks, wvs),
        jnp.arange(n_steps))

    # single commit, outside the loop (in-place on the donated buffers)
    wpos = pos0[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    safe = jnp.where((wpos >= 0) & (wpos < kv.max_seq), wpos, kv.max_seq)

    def commit(cache, new, pos_s):
        return cache.at[:, :, pos_s].set(new.astype(cache.dtype),
                                         mode="drop")

    scat = jax.vmap(commit, in_axes=(1, 1, 0), out_axes=1)
    mask = jax.vmap(lambda m, p: m.at[p].set(True, mode="drop"))(
        mask_f, safe)
    kv = dataclasses.replace(
        kv, k=scat(kv.k, wk, safe), v=scat(kv.v, wv, safe),
        k_scale=scat(kv.k_scale, wks, safe),
        v_scale=scat(kv.v_scale, wvs, safe), mask=mask, pos=pos_f)
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
    from ..kv.paged import PagedKVCache

    loop = loop or _DECODE_LOOP_DEFAULT
    if (loop == "window" and kv_update in (None, "auto", "window")
            and kv.quantized and not isinstance(kv, PagedKVCache)
            and not isinstance(params.layers, (tuple, list))):
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
