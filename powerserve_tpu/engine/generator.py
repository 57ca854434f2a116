"""Generation engine: chunked prefill + jitted decode loop.

Replaces the reference's Model::generate / TokenIterator protocol
(reference src/model/model.hpp:42-186): prefill batches the prompt in
hyper-param-sized chunks (model.hpp:117-160), then decode emits one
token per step. Here both phases are single jitted programs with donated
KV buffers — the graph-build + interpreted-executor pair of the
reference (C12/C13) is replaced by XLA tracing.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import HyperParams, ModelConfig, SamplerConfig
from ..core.logging import Timer, get_logger
from ..core.trace import Trace
from ..kv.cache import KVCache
from ..models.llama import LlamaParams, forward
from ..sampling.sampler import PenaltyState, sample_logits

log = get_logger("engine")


@dataclass
class GenerationStats:
    """Prefill/decode token throughput (reference run.cpp:126-140)."""

    prefill_tokens: int = 0
    prefill_ms: float = 0.0
    decode_tokens: int = 0
    decode_ms: float = 0.0

    @property
    def prefill_speed(self) -> float:
        return self.prefill_tokens / self.prefill_ms * 1e3 if self.prefill_ms else 0.0

    @property
    def decode_speed(self) -> float:
        return self.decode_tokens / self.decode_ms * 1e3 if self.decode_ms else 0.0


class InferenceEngine:
    """Single-model engine over a fixed slot batch.

    Slot 0 is used for single-sequence generate(); the server layer
    drives all slots for continuous batching.
    """

    def __init__(self, params: LlamaParams, cfg: ModelConfig,
                 hp: HyperParams | None = None, backend: str = "auto",
                 mesh=None, eos_id: int = -1, nl_id: int = -1):
        self.params = params
        self.cfg = cfg
        self.hp = hp or HyperParams()
        self.backend = backend
        self.mesh = mesh
        # special-token ids for reference sampler semantics (ignore_eos
        # masking / penalize_nl restore, sampler.cpp:88-168); -1 disables
        self.eos_id = eos_id
        self.nl_id = nl_id
        llm = cfg.llm
        self.max_seq = self.hp.max_seq_len or llm.seq_len
        self.n_slots = self.hp.max_slots
        self.kv = KVCache.create(llm.n_layers, self.n_slots, self.max_seq,
                                 llm.n_kv_heads, llm.head_size,
                                 dtype=self.hp.kv_dtype)
        self.penalty = PenaltyState.create(
            self.n_slots, max(self.hp.sampler.penalty_last_n, 1))
        self.rng = jax.random.PRNGKey(self.hp.sampler.seed)
        self._prefill_fns: dict[int, Callable] = {}
        self._decode_fn: Callable | None = None

    # -- jitted step builders ----------------------------------------------

    def _prefill_fn(self, chunk: int) -> Callable:
        if chunk not in self._prefill_fns:
            llm = self.cfg.llm
            backend = self.backend

            @functools.partial(jax.jit, donate_argnums=(1,))
            def prefill(params, kv, tokens, positions, active):
                return forward(params, llm, kv, tokens, positions,
                               active=active, backend=backend,
                               logits_mode="last")

            self._prefill_fns[chunk] = prefill
        return self._prefill_fns[chunk]

    def _get_decode_fn(self) -> Callable:
        """Block decode: `horizon` steps per device dispatch inside one
        lax.scan — over remote-TPU links a per-token dispatch costs
        ~25ms of fixed latency, which dwarfed the 14ms step itself."""
        if self._decode_fn is None:
            llm = self.cfg.llm
            backend = self.backend
            scfg = self.hp.sampler
            vocab = llm.vocab_size
            eos_id = self.eos_id if self.eos_id >= 0 else None
            nl_id = self.nl_id if self.nl_id >= 0 else None
            horizon = max(int(getattr(self.hp, "decode_horizon", 1)), 1)
            self.horizon = horizon
            # window decode loop (engine/loops.py): keeps the cache
            # buffers loop-invariant (one post-scan commit) — avoids the
            # +2-3 ms/step carried-scatter cliff at 8B cache sizes
            from .loops import (_DECODE_LOOP_DEFAULT, commit_kv_window,
                                make_kv_window, push_kv_window,
                                window_eligible)

            use_window = (_DECODE_LOOP_DEFAULT == "window"
                          and self.mesh is None
                          and window_eligible(self.kv, self.params))
            import dataclasses as _dc

            @functools.partial(jax.jit, donate_argnums=(1, 3))
            def decode(params, kv, tokens, penalty, rng, active):
                def sample(logits, penalty, rng):
                    rng, sub = jax.random.split(rng)
                    nxt = sample_logits(sub, logits, scfg, penalty,
                                        vocab_size=vocab,
                                        eos_id=eos_id, nl_id=nl_id
                                        ).astype(jnp.int32)
                    return nxt, penalty.push(nxt, active), rng

                def body(carry, _):
                    tok, kv, penalty, rng = carry
                    positions = jnp.where(
                        active[:, None], kv.pos[:, None].astype(jnp.int32),
                        -1)
                    logits, kv = forward(params, llm, kv, tok[:, None],
                                         positions, active=active,
                                         backend=backend,
                                         logits_mode="last")
                    nxt, penalty, rng = sample(logits, penalty, rng)
                    return (nxt, kv, penalty, rng), nxt

                def body_window(carry, i):
                    tok, pos, mask, wins, penalty, rng = carry
                    positions = jnp.where(
                        active[:, None], pos[:, None].astype(jnp.int32), -1)
                    kvi = _dc.replace(kv, mask=mask, pos=pos)
                    logits, kvo, blk = forward(
                        params, llm, kvi, tok[:, None], positions,
                        active=active, backend=backend,
                        logits_mode="last", kv_update="window",
                        inflight=wins + (i,))
                    wins = push_kv_window(wins, blk, i)
                    nxt, penalty, rng = sample(logits, penalty, rng)
                    return (nxt, kvo.pos, kvo.mask, wins, penalty,
                            rng), nxt

                if use_window:
                    wins0 = make_kv_window(kv, llm, tokens.shape[0],
                                           horizon)
                    pos0 = kv.pos.astype(jnp.int32)
                    (_, pos_f, mask_f, wins, penalty, rng), toks = \
                        jax.lax.scan(body_window,
                                     (tokens, kv.pos, kv.mask, wins0,
                                      penalty, rng), jnp.arange(horizon))
                    kv = commit_kv_window(kv, wins, pos0, pos_f, mask_f,
                                          active=active)
                else:
                    (_, kv, penalty, rng), toks = jax.lax.scan(
                        body, (tokens, kv, penalty, rng), None,
                        length=horizon)
                return toks.T, kv, penalty, rng  # [S, horizon]

            self._decode_fn = decode
        return self._decode_fn

    # -- single-sequence API (reference TokenIterator) ----------------------

    def reset(self, slot: int = 0) -> None:
        self.kv = self.kv.reset_slot(slot)
        self.penalty = self.penalty.reset_slot(slot)

    def prefill(self, prompt_tokens: list[int], slot: int = 0,
                stats: GenerationStats | None = None) -> np.ndarray:
        """Feed the whole prompt; returns logits for the last token."""
        chunk = max(int(self.hp.batch_size), 1)
        toks = np.asarray(prompt_tokens, np.int32)
        n = len(toks)
        start = int(np.asarray(self.kv.pos)[slot])
        timer = Timer()
        logits = None
        active = np.zeros(self.n_slots, bool)
        active[slot] = True
        active = jnp.asarray(active)
        for off in range(0, n, chunk):
            part = toks[off : off + chunk]
            # final partial chunk jits with its exact length (one extra
            # compile at most; server paths pad instead)
            use = len(part)
            fn = self._prefill_fn(use)
            batch_t = np.zeros((self.n_slots, use), np.int32)
            batch_p = np.full((self.n_slots, use), -1, np.int32)
            batch_t[slot] = part
            batch_p[slot] = start + off + np.arange(use)
            with Trace.span(Trace.SPAN_PREFILL):
                logits, self.kv = fn(self.params, self.kv,
                                     jnp.asarray(batch_t),
                                     jnp.asarray(batch_p), active)
        if logits is not None:
            logits = np.asarray(logits)  # host fetch = real sync point
        if stats is not None:
            stats.prefill_tokens += n
            stats.prefill_ms += timer.elapsed_time_ms()
        # seed the penalty window with the prompt tail (bulk upload)
        self.penalty = self.penalty.seed_slot(slot, toks.tolist())
        return None if logits is None else logits[slot]

    def generate(self, prompt_tokens: list[int], n_predict: int,
                 stop_fn: Callable[[int], bool] | None = None,
                 slot: int = 0,
                 stats: GenerationStats | None = None) -> Iterator[int]:
        """Streaming generation (prefill in first next(), as reference
        TokenIterator does prefill-in-ctor)."""
        stats = stats if stats is not None else GenerationStats()
        logits = self.prefill(prompt_tokens[:-1], slot=slot, stats=stats)
        del logits  # prompt minus last token: last token feeds decode
        decode = self._get_decode_fn()
        cur = int(prompt_tokens[-1])
        active = np.zeros(self.n_slots, bool)
        active[slot] = True
        active = jnp.asarray(active)
        timer = Timer()
        emitted: list[int] = []
        out = 0
        while out < n_predict:
            tokens = jnp.full(self.n_slots, cur, jnp.int32)
            with Trace.span(Trace.SPAN_DECODE):
                toks, self.kv, self.penalty, self.rng = decode(
                    self.params, self.kv, tokens, self.penalty,
                    self.rng, active)
            block = np.asarray(toks)[slot]
            stopped_at = -1
            for h in range(len(block)):
                if out >= n_predict:
                    stopped_at = h
                    break
                t = int(block[h])
                emitted.append(t)
                out += 1
                stats.decode_tokens += 1
                stats.decode_ms = timer.elapsed_time_ms()
                yield t
                if stop_fn is not None and stop_fn(t):
                    stopped_at = h + 1
                    break
            if 0 <= stopped_at < len(block):
                # drop KV entries of the unconsumed tail so the slot can
                # continue cleanly (multi-turn); re-seed the penalty
                # window from the actual sequence (its ring saw the
                # discarded tokens)
                extra = len(block) - stopped_at
                act = np.zeros(self.n_slots, bool)
                act[slot] = True
                self.kv = self.kv.rollback(extra, active=jnp.asarray(act))
                self.penalty = self.penalty.seed_slot(
                    slot, list(prompt_tokens) + emitted)
                return
            cur = int(block[-1])
