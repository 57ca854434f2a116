"""Speculative decoding engine: draft tree + batched target verification.

TPU re-architecture of the reference's SpecTokenIterator
(reference src/speculative/spec_model.hpp:96-113): per step
  1. grow a draft token tree, drafting each depth level in ONE batched
     draft forward (the reference does one forward per node),
  2. ONE batched target forward over the flattened tree with the
     ancestor attention mask,
  3. walk the acceptance chain greedily and commit accepted KV entries
     by gather-compaction (reference verify: token_tree.cpp:181-229,
     rollback semantics kv_cache.hpp:256).

KV bookkeeping per step (commit_len = tokens committed so far):
  - node i is written at cache position commit_len + i in BOTH caches;
    its rope position is commit_len + depth(i)
  - draft forwards see (committed prefix) + (own ancestors) via a full
    per-query visibility override
  - after verify: rollback both caches to commit_len, gather accepted
    entries to the front, advance by n_accepted
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from ..core.logging import Timer, get_logger
from ..core.trace import Trace
from ..kv.cache import KVCache
from ..models.llama import LlamaParams, forward
from ..sampling.sampler import draft_probs
from .tree import SpeculativeConfig, TokenTree, grow_tree

log = get_logger("speculative")


@dataclass
class SpecStats:
    """Acceptance statistics (reference token_tree.cpp:246-253)."""

    steps: int = 0
    drafted: int = 0
    accepted: int = 0
    emitted: int = 0
    decode_ms: float = 0.0

    @property
    def accept_rate(self) -> float:
        return self.accepted / self.drafted if self.drafted else 0.0

    @property
    def tokens_per_step(self) -> float:
        return self.emitted / self.steps if self.steps else 0.0

    def summary(self) -> str:
        return (f"spec: {self.steps} steps, {self.emitted} tokens, "
                f"{self.tokens_per_step:.2f} tok/step, "
                f"accept rate {self.accept_rate:.2%}")


class SpeculativeEngine:
    def __init__(self, target_params: LlamaParams, target_cfg: ModelConfig,
                 draft_params: LlamaParams, draft_cfg: ModelConfig,
                 spec_cfg: SpeculativeConfig | None = None,
                 max_seq: int = 0, kv_dtype: str = "int8",
                 backend: str = "auto"):
        self.tp, self.tcfg = target_params, target_cfg
        self.dp, self.dcfg = draft_params, draft_cfg
        self.cfg = spec_cfg or SpeculativeConfig()
        self.backend = backend
        self.max_seq = max_seq or min(target_cfg.llm.seq_len,
                                      draft_cfg.llm.seq_len)
        self.t_kv = KVCache.create(
            target_cfg.llm.n_layers, 1, self.max_seq,
            target_cfg.llm.n_kv_heads, target_cfg.llm.head_size, kv_dtype)
        self.d_kv = KVCache.create(
            draft_cfg.llm.n_layers, 1, self.max_seq,
            draft_cfg.llm.n_kv_heads, draft_cfg.llm.head_size, kv_dtype)
        self.commit_len = 0
        self._jit_cache: dict = {}

    # -- jitted steps -------------------------------------------------------

    def _draft_fn(self, F: int):
        key = ("draft", F)
        if key not in self._jit_cache:
            llm = self.dcfg.llm
            backend = self.backend
            k = self.cfg.draft_top_k
            temp = self.cfg.draft_temperature

            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, kv, tokens, rope_pos, cache_pos, vis):
                logits, kv = forward(params, llm, kv, tokens, rope_pos,
                                     cache_positions=cache_pos,
                                     vis_override=vis, backend=backend,
                                     logits_mode="all")
                probs, ids = draft_probs(logits[0, :, :llm.vocab_size],
                                         k, temp)
                return probs, ids, kv

            self._jit_cache[key] = step
        return self._jit_cache[key]

    def _verify_fn(self, n: int):
        key = ("verify", n)
        if key not in self._jit_cache:
            llm = self.tcfg.llm
            backend = self.backend

            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, kv, tokens, rope_pos, cache_pos, intra):
                logits, kv = forward(params, llm, kv, tokens, rope_pos,
                                     cache_positions=cache_pos,
                                     intra_mask=intra, backend=backend,
                                     logits_mode="all")
                sampled = jnp.argmax(logits[0, :, :llm.vocab_size], axis=-1)
                return sampled, kv

            self._jit_cache[key] = step
        return self._jit_cache[key]

    def _prefill_fn(self, model: str, T: int):
        key = ("prefill", model, T)
        if key not in self._jit_cache:
            llm = (self.tcfg if model == "t" else self.dcfg).llm
            backend = self.backend

            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, kv, tokens, positions):
                return forward(params, llm, kv, tokens, positions,
                               backend=backend, logits_mode="none")

            self._jit_cache[key] = step
        return self._jit_cache[key]

    # -- API ----------------------------------------------------------------

    def reset(self) -> None:
        self.t_kv = self.t_kv.reset_slot(0)
        self.d_kv = self.d_kv.reset_slot(0)
        self.commit_len = 0

    def prefill(self, prompt_tokens: list[int], chunk: int = 128) -> None:
        """Prefill BOTH models on the prompt minus its last token (the
        last token seeds the first tree root, reference spec_model.hpp
        prefills both then drafts from the last prompt token)."""
        toks = np.asarray(prompt_tokens[:-1], np.int32)
        for off in range(0, len(toks), chunk):
            part = toks[off : off + chunk]
            pos = self.commit_len + off + np.arange(len(part))
            t = jnp.asarray(part[None, :])
            p = jnp.asarray(pos[None, :].astype(np.int32))
            _, self.t_kv = self._prefill_fn("t", len(part))(
                self.tp, self.t_kv, t, p)
            _, self.d_kv = self._prefill_fn("d", len(part))(
                self.dp, self.d_kv, t, p)
        self.commit_len += len(toks)
        self._root = int(prompt_tokens[-1])

    def _draft_level(self, tree: TokenTree, frontier_tokens: np.ndarray,
                     frontier_idx: list[int]) -> tuple[np.ndarray, np.ndarray]:
        """One batched draft forward over a frontier level."""
        F = len(frontier_idx)
        Fpad = self.cfg.draft_batch_size  # fixed jit shape
        T = self.max_seq
        c = self.commit_len
        rope_pos = np.full(Fpad, -1, np.int32)
        cache_pos = np.full(Fpad, -1, np.int32)
        vis = np.zeros((Fpad, T), bool)
        vis[:, 0] = True  # keep padded rows softmax-safe
        for r, idx in enumerate(frontier_idx):
            nd = tree.nodes[idx]
            rope_pos[r] = c + nd.depth
            cache_pos[r] = c + idx
            vis[r, :c] = True
            j = idx
            while j >= 0:
                vis[r, c + j] = True
                j = tree.nodes[j].parent
        toks = np.zeros(Fpad, np.int32)
        toks[:F] = frontier_tokens
        fn = self._draft_fn(Fpad)
        with Trace.span(Trace.SPAN_DRAFT_FORWARD):
            probs, ids, self.d_kv = fn(
            self.dp, self.d_kv, jnp.asarray(toks[None, :]),
            jnp.asarray(rope_pos[None, :]), jnp.asarray(cache_pos[None, :]),
            jnp.asarray(vis[None, :, :]))
        return np.asarray(probs)[:F], np.asarray(ids)[:F]

    def step(self, stats: SpecStats | None = None) -> list[int]:
        """One draft->verify->accept cycle; returns emitted tokens."""
        c = self.commit_len

        def draft_step(tokens, depths, tree, frontier_idx):
            return self._draft_level(tree, tokens, frontier_idx)

        tree = grow_tree(self._root, self.cfg, draft_step)
        n = tree.size
        npad = self.cfg.draft_batch_size

        tokens = np.zeros(npad, np.int32)
        tokens[:n] = tree.tokens()
        rope_pos = np.full(npad, -1, np.int32)
        rope_pos[:n] = c + tree.depths()
        cache_pos = np.full(npad, -1, np.int32)
        cache_pos[:n] = c + np.arange(n)
        intra = np.zeros((npad, npad), bool)
        intra[:n, :n] = tree.ancestor_mask()
        np.fill_diagonal(intra, True)  # padded rows see themselves

        fn = self._verify_fn(npad)
        with Trace.span(Trace.SPAN_VERIFY):
            sampled, self.t_kv = fn(self.tp, self.t_kv,
                                jnp.asarray(tokens[None, :]),
                                jnp.asarray(rope_pos[None, :]),
                                jnp.asarray(cache_pos[None, :]),
                                jnp.asarray(intra))
        sampled = np.asarray(sampled)[:n]

        accepted, emitted = tree.accepted_chain(sampled)
        n_acc = len(accepted)

        # rollback both caches to the committed prefix, then compact the
        # accepted chain's entries to the front
        self.t_kv = self.t_kv.rollback(self.t_kv.pos - c)
        self.d_kv = self.d_kv.rollback(self.d_kv.pos - c)
        if n_acc:
            pad = npad
            src = np.full((1, pad), -1, np.int32)
            # accepted chain: root first (its KV belongs to the sequence),
            # then accepted nodes
            chain = [0] + accepted
            src[0, :len(chain)] = c + np.asarray(chain, np.int32)
            n_accept = jnp.asarray([len(chain)], jnp.int32)
            self.t_kv = self.t_kv.commit_tokens(jnp.arange(1),
                                                jnp.asarray(src), n_accept)
            self.d_kv = self.d_kv.commit_tokens(jnp.arange(1),
                                                jnp.asarray(src), n_accept)
            self.commit_len = c + len(chain)
        else:
            # only the root materialized: commit just its entry
            src = np.full((1, npad), -1, np.int32)
            src[0, 0] = c
            one = jnp.asarray([1], jnp.int32)
            self.t_kv = self.t_kv.commit_tokens(jnp.arange(1),
                                                jnp.asarray(src), one)
            self.d_kv = self.d_kv.commit_tokens(jnp.arange(1),
                                                jnp.asarray(src), one)
            self.commit_len = c + 1

        self._root = emitted[-1]
        if stats is not None:
            stats.steps += 1
            stats.drafted += n - 1
            stats.accepted += n_acc
            stats.emitted += len(emitted)
        return emitted

    def generate(self, prompt_tokens: list[int], n_predict: int,
                 stop_fn=None, stats: SpecStats | None = None):
        """Streaming speculative generation."""
        stats = stats if stats is not None else SpecStats()
        self.prefill(prompt_tokens)
        timer = Timer()
        out = 0
        while out < n_predict:
            for t in self.step(stats):
                out += 1
                yield t
                if (stop_fn is not None and stop_fn(t)) or out >= n_predict:
                    stats.decode_ms = timer.elapsed_time_ms()
                    return
        stats.decode_ms = timer.elapsed_time_ms()
