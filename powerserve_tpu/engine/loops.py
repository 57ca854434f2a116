"""Device-side multi-step decode loop.

Runs N greedy decode steps inside one jitted lax.scan — one host
round-trip per N tokens instead of per token. This both amortizes
dispatch latency (critical over remote-TPU links) and is the shape the
benchmark measures. Token feedback stays on device (argmax -> next
step's input), matching the reference's per-token greedy decode
semantics (llama_model.cpp:119-133) without its per-step host loop."""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig
from ..kv.cache import KVCache
from ..models.llama import LlamaParams, forward


@functools.partial(jax.jit,
                   static_argnames=("llm", "n_steps", "backend", "kv_update"),
                   donate_argnums=(2,))
def decode_scan(params: LlamaParams, tokens: jax.Array, kv: KVCache,
                llm: LLMConfig, n_steps: int,
                backend: str = "auto",
                kv_update: str | None = None) -> tuple[jax.Array, KVCache]:
    """Greedy-decode n_steps tokens for every slot.

    tokens: [S] int32 (current token per slot). Returns ([S, n_steps]
    generated tokens, updated kv)."""

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
                   static_argnames=("llm", "backend", "kv_update"),
                   donate_argnums=(3,))
def prefill_step(params: LlamaParams, tokens: jax.Array,
                 positions: jax.Array, kv: KVCache, llm: LLMConfig,
                 backend: str = "auto",
                 kv_update: str | None = None) -> tuple[jax.Array, KVCache]:
    """One prefill chunk: tokens/positions [S, T]."""
    return forward(params, llm, kv, tokens, positions, backend=backend,
                   logits_mode="last", kv_update=kv_update)
