"""Vectorized sampler chain (reference src/sampler/, C26).

The reference applies a chain-of-responsibility over a host-side
ProbArray in the fixed order RepeatPenalty -> TopK -> Temperature ->
Softmax -> TopP -> Normalize -> Stochastic (sampler_chain.cpp:5-48).
Here the whole chain is one vectorized device function over a batch of
logit rows [S, V], so continuous batching samples all slots in one call;
the repeat-penalty window lives in a device ring buffer instead of the
reference's per-sequence std::deque (sampler.hpp:69-115).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SamplerConfig

NEG_INF = -1e30


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["recent", "count"],
    meta_fields=[],
)
@dataclass
class PenaltyState:
    """Last-n token window per slot (ring buffer)."""

    recent: jax.Array  # [S, P] int32, -1 = empty
    count: jax.Array  # [S] int32 — total tokens pushed

    @classmethod
    def create(cls, n_slots: int, window: int) -> "PenaltyState":
        window = max(int(window), 1)
        return cls(jnp.full((n_slots, window), -1, jnp.int32),
                   jnp.zeros(n_slots, jnp.int32))

    def push(self, tokens: jax.Array,
             active: jax.Array | None = None) -> "PenaltyState":
        """Append one accepted token per slot (tokens [S])."""
        S, P = self.recent.shape
        if active is None:
            active = jnp.ones(S, jnp.bool_)
        idx = self.count % P
        new_recent = self.recent.at[jnp.arange(S), idx].set(
            jnp.where(active, tokens, self.recent[jnp.arange(S), idx]))
        return PenaltyState(new_recent,
                            self.count + active.astype(jnp.int32))

    def reset_slot(self, slot) -> "PenaltyState":
        return PenaltyState(self.recent.at[slot].set(-1),
                            self.count.at[slot].set(0))

    def seed_slot(self, slot: int, tokens: list[int]) -> "PenaltyState":
        """Bulk-fill a slot's window with a prompt tail (one device
        upload instead of one push per token)."""
        P = self.recent.shape[1]
        tail = list(tokens)[-P:]
        row = np.full(P, -1, np.int32)
        row[: len(tail)] = tail
        return PenaltyState(
            self.recent.at[slot].set(jnp.asarray(row)),
            self.count.at[slot].set(len(tail)))


def apply_repeat_penalty(logits: jax.Array, state: PenaltyState,
                         cfg: SamplerConfig,
                         eos_id: int | None = None,
                         nl_id: int | None = None) -> jax.Array:
    """Reference sampler.cpp:76-168 semantics, vectorized.

    ignore_eos masks the special EOS logit to -inf; for every token in
    the last-n window positive logits are divided by penalty_repeat,
    negative multiplied, then freq/presence penalties subtract counts;
    with penalize_nl=False the newline logit is restored to its
    pre-penalty value afterwards.
    """
    lf = logits.astype(jnp.float32)
    if cfg.ignore_eos and eos_id is not None and eos_id >= 0:
        lf = lf.at[:, eos_id].set(NEG_INF)
    if (cfg.penalty_repeat == 1.0 and cfg.penalty_freq == 0.0
            and cfg.penalty_present == 0.0):
        return lf
    S, V = lf.shape
    P = state.recent.shape[1]
    window = min(cfg.penalty_last_n, P) if cfg.penalty_last_n > 0 else 0
    if window == 0:
        return lf

    # occurrence counts of window tokens: scatter-add ones, dropping -1
    # lanes and ring entries older than the last `window` pushes (ring
    # slot j's most recent push index is count-1-((count-1-j) mod P))
    j = jnp.arange(P)[None, :]
    cnt = state.count[:, None]
    push_idx = cnt - 1 - jnp.mod(cnt - 1 - j, P)
    in_window = push_idx >= (cnt - window)
    idx = jnp.where((state.recent >= 0) & in_window, state.recent, V)
    counts = jnp.zeros((S, V), jnp.float32)
    counts = jax.vmap(lambda c, i: c.at[i].add(1.0, mode="drop"))(counts, idx)
    present = counts > 0

    pre = lf
    penalized = jnp.where(lf > 0, lf / cfg.penalty_repeat,
                          lf * cfg.penalty_repeat)
    lf = jnp.where(present, penalized, lf)
    lf = lf - counts * cfg.penalty_freq - present * cfg.penalty_present
    if not cfg.penalize_nl and nl_id is not None and nl_id >= 0:
        lf = lf.at[:, nl_id].set(pre[:, nl_id])
    return lf


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Mask everything below the k-th largest logit (sampler.cpp:24-44)."""
    if k <= 0:
        return logits
    V = logits.shape[-1]
    k = min(k, V)
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(probs: jax.Array, p: float, min_keep: int = 1) -> jax.Array:
    """Nucleus filter over a prob distribution (sampler.cpp:46-74).
    Returns unnormalized probs with the tail zeroed."""
    if p >= 1.0:
        return probs
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    csum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens while cumulative sum (inclusive) hasn't reached p,
    # plus the one that crosses it; always keep min_keep
    keep_sorted = (csum - sorted_probs) < p
    keep_sorted = keep_sorted.at[..., :max(min_keep, 1)].set(True)
    # threshold = smallest kept prob
    thr = jnp.min(jnp.where(keep_sorted, sorted_probs, jnp.inf),
                  axis=-1, keepdims=True)
    return jnp.where(probs >= thr, probs, 0.0)


def sample_logits(key: jax.Array, logits: jax.Array, cfg: SamplerConfig,
                  state: PenaltyState | None = None,
                  vocab_size: int | None = None,
                  eos_id: int | None = None,
                  nl_id: int | None = None) -> jax.Array:
    """Full chain -> sampled token ids [S] (order: sampler_chain.cpp:18-37)."""
    lf = logits.astype(jnp.float32)
    if vocab_size is not None and vocab_size < lf.shape[-1]:
        pad = lf.shape[-1] - vocab_size
        lf = jnp.concatenate(
            [lf[..., :vocab_size], jnp.full(lf.shape[:-1] + (pad,), NEG_INF)],
            axis=-1)
    if state is not None:
        lf = apply_repeat_penalty(lf, state, cfg, eos_id=eos_id, nl_id=nl_id)
    if cfg.temperature <= 0.0:
        return jnp.argmax(lf, axis=-1)
    lf = apply_top_k(lf, cfg.top_k)
    lf = lf / cfg.temperature
    probs = jax.nn.softmax(lf, axis=-1)
    probs = apply_top_p(probs, cfg.top_p, cfg.min_keep)
    # renormalize + categorical draw
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    logp = jnp.where(probs > 0, logp, NEG_INF)
    return jax.random.categorical(key, logp, axis=-1)


def sample_dist_batched(logits: jax.Array, temperature: jax.Array,
                        top_k: jax.Array, top_p: jax.Array,
                        state: PenaltyState | None = None,
                        penalty_repeat: jax.Array | None = None,
                        penalty_freq: jax.Array | None = None,
                        penalty_present: jax.Array | None = None,
                        max_top_k: int = 64,
                        vocab_size: int | None = None) -> jax.Array:
    """The per-slot SAMPLING DISTRIBUTION [S, V] (normalized) after the
    full transform chain (penalties -> top-k -> temperature -> top-p).
    temperature <= 0 slots get a one-hot at the (post-penalty) argmax.

    penalty_repeat/penalty_freq/penalty_present: per-slot [S] arrays
    with the reference's RepeatPenalty semantics (sampler.cpp:76-150):
    window tokens' positive logits divided / negative multiplied by
    penalty_repeat, then the SUBTRACTIVE freq/presence terms
    lf -= count * freq + present * presence (the OpenAI
    frequency_penalty / presence_penalty fields, counted over the
    penalty window rather than the whole generation).

    Exposed separately from the draw so speculative rejection sampling
    can evaluate p(x)/q(x) and residuals against the EXACT distributions
    tokens are sampled from."""
    S, V = logits.shape
    lf = logits.astype(jnp.float32)
    if vocab_size is not None and vocab_size < V:
        col = jax.lax.broadcasted_iota(jnp.int32, (S, V), 1)
        lf = jnp.where(col < vocab_size, lf, NEG_INF)
    if state is not None and (penalty_repeat is not None
                              or penalty_freq is not None
                              or penalty_present is not None):
        idx = jnp.where(state.recent >= 0, state.recent, V)
        counts = jnp.zeros((S, V), jnp.float32)
        counts = jax.vmap(lambda c, i: c.at[i].add(1.0, mode="drop"))(counts, idx)
        present = counts > 0
        if penalty_repeat is not None:
            pr = penalty_repeat[:, None]
            penalized = jnp.where(lf > 0, lf / pr, lf * pr)
            lf = jnp.where(present, penalized, lf)
        if penalty_freq is not None:
            lf = lf - counts * penalty_freq[:, None]
        if penalty_present is not None:
            lf = lf - present * penalty_present[:, None]

    greedy_tok = jnp.argmax(lf, axis=-1)

    # top-k: rank-mask against a static max_top_k window
    kth_vals, _ = jax.lax.top_k(lf, max_top_k)  # [S, max_top_k] desc
    k_eff = jnp.clip(jnp.where(top_k <= 0, max_top_k, top_k), 1, max_top_k)
    thr = jnp.take_along_axis(kth_vals, (k_eff - 1)[:, None], axis=-1)
    lf = jnp.where(lf < thr, NEG_INF, lf)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    probs = jax.nn.softmax(lf / temp, axis=-1)

    # top-p nucleus
    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]
    csum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (csum - sorted_probs) < top_p[:, None]
    keep_sorted = keep_sorted.at[:, 0].set(True)
    pthr = jnp.min(jnp.where(keep_sorted, sorted_probs, jnp.inf), axis=-1,
                   keepdims=True)
    probs = jnp.where(probs >= pthr, probs, 0.0)
    probs = probs / jnp.maximum(probs.sum(axis=-1, keepdims=True), 1e-30)
    onehot = jax.nn.one_hot(greedy_tok, V, dtype=jnp.float32)
    return jnp.where(temperature[:, None] <= 0.0, onehot, probs)


def categorical_from_dist(keys: jax.Array, probs: jax.Array) -> jax.Array:
    """Per-slot categorical draw from [S, V] probs (keys [S, 2]).
    One-hot rows (greedy) resolve deterministically to their argmax."""
    logp = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-30)), NEG_INF)
    return jax.vmap(jax.random.categorical)(keys, logp)


def sample_logits_batched(key: jax.Array, logits: jax.Array,
                          temperature: jax.Array, top_k: jax.Array,
                          top_p: jax.Array,
                          state: PenaltyState | None = None,
                          penalty_repeat: jax.Array | None = None,
                          penalty_freq: jax.Array | None = None,
                          penalty_present: jax.Array | None = None,
                          max_top_k: int = 64,
                          vocab_size: int | None = None,
                          keys: jax.Array | None = None) -> jax.Array:
    """Per-slot sampling with *array* parameters (continuous batching:
    every request carries its own temperature/top_k/top_p).

    temperature/top_k/top_p/penalty_repeat/penalty_freq/
    penalty_present: [S]. temperature <= 0 means greedy for that slot.
    top_k <= 0 disables top-k (capped at max_top_k otherwise).

    keys: optional per-slot PRNG keys [S, 2] (uint32). When given, each
    slot draws from its own key chain, so a request with an explicit
    seed reproduces its sample stream regardless of what other slots
    are doing (the OpenAI `seed` parameter); `key` is then ignored.
    """
    probs = sample_dist_batched(logits, temperature, top_k, top_p,
                                state=state, penalty_repeat=penalty_repeat,
                                penalty_freq=penalty_freq,
                                penalty_present=penalty_present,
                                max_top_k=max_top_k, vocab_size=vocab_size)
    greedy_tok = jnp.argmax(probs, axis=-1)
    logp = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-30)), NEG_INF)
    if keys is not None:
        sampled = jax.vmap(jax.random.categorical)(keys, logp)
    else:
        sampled = jax.random.categorical(key, logp, axis=-1)
    return jnp.where(temperature <= 0.0, greedy_tok, sampled)


def greedy_sample(logits: jax.Array) -> jax.Array:
    """argmax (reference ProbArray greedy_sample / llama decode)."""
    return jnp.argmax(logits, axis=-1)


def draft_probs(logits: jax.Array, top_k: int,
                temperature: float) -> tuple[jax.Array, jax.Array]:
    """Draft-model sampler for tree speculation: TopK -> Temperature ->
    Softmax (token_tree.cpp:36-40). Returns (probs [S, k], ids [S, k])."""
    vals, ids = jax.lax.top_k(logits.astype(jnp.float32), top_k)
    probs = jax.nn.softmax(vals / max(temperature, 1e-6), axis=-1)
    return probs, ids
