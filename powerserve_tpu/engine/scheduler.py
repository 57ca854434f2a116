"""Continuous-batching scheduler: requests -> slots of one fixed-shape
jitted step.

Net-new vs the reference, which decodes one sequence at a time behind a
mutex (SURVEY §2.3 "Request concurrency: minimal"): here every decode
step advances ALL active slots in one device call; prefill runs
chunk-wise with priority over decode (new requests start fast), and each
request carries its own sampling parameters as per-slot device arrays.
"""

from __future__ import annotations

import functools
import itertools
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import HyperParams, ModelConfig
from ..core.logging import get_logger
from ..kv.cache import KVCache
from ..models.llama import LlamaParams, forward
from ..sampling.sampler import PenaltyState, sample_logits_batched

log = get_logger("scheduler")


@dataclass
class Request:
    prompt_ids: list[int]
    max_tokens: int = 128
    temperature: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    penalty_repeat: float = 1.0
    # subtractive OpenAI-style penalties over the recent-token window
    # (sampling/sampler.py sample_dist_batched; reference
    # sampler.cpp:76-150 freq/present semantics)
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    stop_ids: set[int] = field(default_factory=set)
    # explicit per-request seed (OpenAI `seed`): the slot gets its own
    # PRNG key chain, so the sample stream reproduces regardless of
    # concurrent traffic. None = derive from the scheduler's global seed.
    seed: int | None = None
    # number of top-logprob alternatives to record per token (0 = off);
    # chosen-token logprob is always recorded when > 0
    logprobs: int = 0
    # precomputed prompt embeddings [len(prompt_ids), dim] (VLM: vision
    # features already injected at image-token positions); requires a
    # scheduler built with mm_dim. The prompt must END with a text
    # token (its decode feed uses the embedding table). Prefix caching
    # is skipped for embed requests — image tokens share one id, so
    # token-id keys would collide across different images.
    embeds: Any | None = None
    # sink receives token ids, then None when finished
    sink: Callable[[int | None], None] = lambda t: None
    id: int = 0
    # set by the consumer to abort generation (e.g. a stop string
    # matched in decoded text); the scheduler frees the slot on its
    # next tick
    cancelled: bool = False
    # filled by the scheduler
    n_generated: int = 0
    finish_reason: str = ""
    token_logprobs: list = field(default_factory=list)  # [float]
    top_logprobs: list = field(default_factory=list)  # [[(id, lp)]]
    submitted_at: float = 0.0  # set by submit(); drives latency metrics


@dataclass
class _Slot:
    req: Request | None = None
    prefill_off: int = 0
    cur_token: int = 0
    prefilling: bool = False
    # tokens generated while this slot was resident — the recompute
    # payload if the paged pool preempts it (prompt + generated
    # re-prefills; already-emitted tokens are never re-emitted)
    generated: list = field(default_factory=list)


class PrefixCache:
    """LRU of prompt-prefix KV snapshots (device arrays). Requests that
    share a prefix (system prompts, few-shot headers) skip its prefill:
    KV for positions 0..n-1 depends only on tokens 0..n-1, so reuse is
    exact. Net-new vs the reference (kv/persist.py covers only an
    explicit --save-kv/--load-kv flow).

    Pinned entries (HTTP sessions, /v1/sessions) bypass the min-length
    rule and are never evicted by capacity pressure."""

    def __init__(self, capacity: int, min_len: int):
        self.capacity = capacity
        self.min_len = min_len
        self.entries: dict[tuple, dict] = {}
        self._order: list[tuple] = []  # eviction order; excludes pinned
        self.pinned: set[tuple] = set()
        self.hits = 0
        self.misses = 0

    def match(self, prompt_ids: list[int]) -> tuple[int, dict] | None:
        """Longest cached entry that is a prefix of prompt_ids."""
        best = None
        t = tuple(prompt_ids)
        for key, saved in self.entries.items():
            n = len(key)
            if n <= len(t) and t[:n] == key and (
                    best is None or n > best[0]):
                best = (n, saved)
        if best is None:
            self.misses += 1
            return None
        self.hits += 1
        return best

    def put(self, prefix_ids: list[int], saved: dict,
            pin: bool = False) -> None:
        key = tuple(prefix_ids)
        if key in self.entries:
            if pin:
                self.pinned.add(key)
                if key in self._order:
                    self._order.remove(key)
            return
        if not pin and len(key) < self.min_len:
            return
        if len(self._order) >= self.capacity and self._order:
            old = self._order.pop(0)
            self.entries.pop(old, None)
        self.entries[key] = saved
        if pin:
            self.pinned.add(key)
        else:
            self._order.append(key)

    def drop(self, prefix_ids: list[int]) -> bool:
        key = tuple(prefix_ids)
        self.pinned.discard(key)
        if key in self._order:
            self._order.remove(key)
        return self.entries.pop(key, None) is not None


class BatchScheduler:
    """Owns the KV cache and the step loop; thread-safe submit()."""

    def __init__(self, params: LlamaParams, cfg: ModelConfig,
                 hp: HyperParams | None = None, backend: str = "auto",
                 draft_params: LlamaParams | None = None,
                 draft_llm=None, spec_k: int = 0, mesh=None,
                 eagle_params=None, eagle_llm=None, mm_dim: int = 0,
                 pp_mesh=None, tp_mesh=None):
        """draft_params/draft_llm: enable BATCHED chain speculation —
        every decode tick drafts a k-chain per active slot (one batched
        draft scan), verifies all slots in one target forward, and
        accepts per-slot (speculation composes with continuous batching
        instead of serializing behind a lock; net-new vs the reference's
        single-stream spec, spec_model.hpp:96-113). Pass the target's
        own params with a layer-truncated config for LayerSkip
        self-drafting. Spec mode samples each chain position with the
        slot's sampler params (emitted tokens are exact target samples;
        acceptance = draft token equals the target's sampled token);
        repeat penalties and logprobs are not applied in spec mode.

        eagle_params/eagle_llm: BATCHED EAGLE speculation instead — the
        draft is a feature-level head (speculative/eagle.py) drafting a
        spec_k chain per slot; the scheduler carries each slot's last
        target feature across ticks (and through the prefix cache).

        mm_dim > 0: multimodal prefill — requests may carry
        precomputed prompt embeddings (Request.embeds, vision features
        injected); the prefill jit overlays them per slot, so VLM
        requests COMPOSE with continuous batching (the reference's VLM
        is single-stream NPU-only, internvl_model.cpp). Incompatible
        with speculation.

        tp_mesh: SHARD_MAP tensor-parallel serving (parallel/tp.py) —
        every step (prefill/decode/mm/spec scans) runs inside a
        shard_map over the (dp, tp) mesh with the fused Pallas dequant
        kernel on each shard's local weights, instead of the GSPMD
        `mesh` path's backend="xla" fallback. params (and draft_params)
        must already be laid out by parallel.tp.shard_params_tp (and
        eagle_params by parallel.tp.shard_eagle_tp). Constraints:
        paged pool needs dp == sp == 1; speculation (chain/tree/EAGLE)
        needs sp == 1."""
        self.params = params
        self.cfg = cfg
        self.hp = hp or HyperParams()
        self.backend = backend
        llm = cfg.llm
        self.S = self.hp.max_slots
        self.max_seq = self.hp.max_seq_len or llm.seq_len
        self.chunk = max(int(self.hp.batch_size), 8)
        self.pool = None
        if getattr(self.hp, "paged_pages", 0) > 0:
            # paged KV pool: slots share hp.paged_pages pages instead of
            # each reserving max_seq (memory oversubscription; kv/paged.py).
            # Admission defers and decode preempts-by-recompute when the
            # pool runs dry.
            assert self.hp.kv_dtype == "int8", "paged KV pool is int8-only"
            from ..kv.paged import PagedKVCache, PagePool

            page = max(int(getattr(self.hp, "page_size", 64)), 8)
            self.kv = PagedKVCache.create(
                llm.n_layers, self.S, self.max_seq, llm.n_kv_heads,
                llm.head_size, n_pages=int(self.hp.paged_pages),
                page_size=page)
            self.max_seq = self.kv.max_seq  # rounded up to whole pages
            self.pool = PagePool(int(self.hp.paged_pages), self.S,
                                 self.kv.max_pages, page)
            # host position mirror for DOUBLE-BUFFERED pool ticks
            # (r5): page grants for the next tick come from the last
            # drained positions (seeded at prefill completion,
            # refreshed by every drain's batched fetch) instead of a
            # per-tick device sync; slots with stale mirrors fall back
            # to the exact single-buffered path
            self._pos_drained = np.zeros(self.S, np.int64)
            self._pos_known: set[int] = set()
        else:
            self.kv = KVCache.create(llm.n_layers, self.S, self.max_seq,
                                     llm.n_kv_heads, llm.head_size,
                                     self.hp.kv_dtype)
        self.dparams = draft_params
        self.d_llm = draft_llm
        self.spec_k = spec_k or max(int(getattr(self.hp, "spec_k", 4)), 1)
        self.eparams = eagle_params
        self.e_llm = eagle_llm
        self.is_eagle = eagle_params is not None
        self.mm_dim = int(mm_dim)
        if self.mm_dim and draft_params is not None:
            # VLM x speculation: the draft prefills from the SAME
            # injected embeddings, so its hidden dim must match
            assert draft_llm is not None and draft_llm.dim == llm.dim, \
                "mm x spec needs draft dim == target dim"
        self.d_kv = None
        if self.is_eagle:
            assert eagle_llm is not None and draft_params is None
            self.d_kv = KVCache.create(
                eagle_llm.n_layers, self.S, self.max_seq,
                eagle_llm.n_kv_heads, eagle_llm.head_size,
                self.hp.kv_dtype)
            # per-slot carried target feature [S, dim]: during prefill,
            # the feature at the slot's last prefilled position; during
            # decode, the feature paired with the slot's root token
            self.feat = jnp.zeros((self.S, llm.dim), jnp.float32)
        elif draft_params is not None:
            assert draft_llm is not None
            self.d_kv = KVCache.create(
                draft_llm.n_layers, self.S, self.max_seq,
                draft_llm.n_kv_heads, draft_llm.head_size,
                self.hp.kv_dtype)
        self.pp_mesh = pp_mesh
        if pp_mesh is not None:
            # pipeline-parallel serving (parallel/pp.py): params must
            # already be sharded by shard_params_pp; the kv created
            # above shards its layer axis here. Plain, multimodal,
            # CHAIN-speculation, and EAGLE-chain decode/prefill (the
            # chain/eagle scans run pp_forward via injectable fwd
            # callables; the tiny EAGLE head + its cache replicate
            # across stages and draft off the psum-replicated feature
            # stream; tree templates need vis_override, which the
            # staged pipeline lacks). Self-drafting is out too: a
            # layer-truncated draft config breaks the per-stage layout.
            assert mesh is None, "pp excludes the GSPMD mesh path"
            from ..parallel.pp import shard_kv_pp

            if draft_params is not None:
                assert draft_llm.n_layers % pp_mesh.shape["pp"] == 0 \
                    and draft_params is not params, \
                    "spec x pp needs a separate pp-sharded draft model " \
                    "(self-draft layer truncation breaks stage layout)"
                self.d_kv = shard_kv_pp(self.d_kv, pp_mesh)
            self.kv = shard_kv_pp(self.kv, pp_mesh)
        self.tp_mesh = tp_mesh
        if tp_mesh is not None:
            # shard_map tensor-parallel serving: the KV cache shards kv
            # heads over "tp" / slots over "dp" with EXPLICIT specs;
            # every jitted step wraps the forward in a shard_map so the
            # Pallas kernel runs per-shard (parallel/tp.py docstring).
            assert mesh is None and pp_mesh is None, \
                "tp_mesh excludes the GSPMD mesh and pp_mesh paths"
            from ..parallel.tp import shard_kv_tp

            if self.pool is not None:
                # paged x dp: partition the pool across dp groups (each
                # shard scatters only into its local slab shard; the
                # shard_map body remaps global->local page ids) — the
                # host allocator is rebuilt with per-group free lists
                assert tp_mesh.shape.get("sp", 1) == 1, \
                    "paged pool x tp_mesh requires sp == 1"
                dp_n = tp_mesh.shape.get("dp", 1)
                if dp_n > 1:
                    from ..kv.paged import PagePool

                    self.pool = PagePool(
                        self.pool.n_pages, self.S, self.pool.max_pages,
                        self.pool.page_size, n_groups=dp_n)
            if self.d_kv is not None:
                assert tp_mesh.shape.get("sp", 1) == 1, \
                    "speculation x tp_mesh requires sp == 1"
                self.d_kv = shard_kv_tp(self.d_kv, tp_mesh)
            self.kv = shard_kv_tp(self.kv, tp_mesh)
        self.mesh = mesh
        if mesh is not None:
            # multichip serving (GSPMD): params must already be sharded
            # (parallel/mesh.py:shard_params); the KV cache shards kv
            # heads over "tp" and slots over "dp", and XLA partitions
            # every jitted step. Pallas kernels are GSPMD-opaque, so the
            # sharded path runs backend="xla" (the shard_map kernel path
            # is parallel/tp.py for single-sequence workloads).
            from ..parallel.mesh import shard_kv

            self.backend = backend = "xla"
            self.kv = shard_kv(self.kv, mesh)
            if self.d_kv is not None:
                self.d_kv = shard_kv(self.d_kv, mesh)
        self.penalty = PenaltyState.create(
            self.S, max(self.hp.sampler.penalty_last_n, 1))
        # per-slot raw PRNG keys [S, 2]: a request with an explicit seed
        # owns a reproducible chain; others derive from the global seed
        self.rngs = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(self.S) + self.hp.sampler.seed)
        self.slots = [_Slot() for _ in range(self.S)]
        # prompt-prefix KV reuse; in spec mode entries carry BOTH the
        # target and the draft cache prefixes (the spec prefill writes
        # the same tokens/positions to both, so the prefixes match)
        self.prefix_cache = None
        if getattr(self.hp, "prefix_cache", 0) > 0:
            self.prefix_cache = PrefixCache(
                self.hp.prefix_cache,
                max(int(getattr(self.hp, "prefix_cache_min", 16)), 1))
        # prefixes to pin (HTTP sessions): consumed by _prefill_tick
        self._pin_reqs: set[tuple] = set()
        # /metrics counters
        self.n_requests = 0
        self.n_tokens_generated = 0
        self.n_prompt_tokens = 0
        # speculation acceptance (reference print_stat,
        # token_tree.cpp:246-253, as live serving metrics)
        self.n_spec_steps = 0
        self.n_preemptions = 0
        self.n_pool_slow_ticks = 0  # pool ticks that fell back to the
        # single-buffered exact path (stale mirror / pool pressure)
        self.n_spec_drafted = 0
        self.n_spec_accepted = 0
        self.started_at = time.time()
        # sliding windows for latency percentiles (seconds)
        from collections import deque

        self._ttft = deque(maxlen=512)
        self._req_latency = deque(maxlen=512)
        # requests deferred by paged-pool backpressure (admitted before
        # anything in `pending`); preempted requests also land here
        self._waitq: "deque[Request]" = deque()
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._ids = itertools.count()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._thread: threading.Thread | None = None
        # double-buffered decode ticks: tick N+1 dispatches BEFORE tick
        # N's results are fetched, so the host fetch + bookkeeping hide
        # under device execution (the reference pipelines NPU execution
        # against host prep the same way, causal_models.cpp:298-330).
        # Plain decode ticks only — spec/eagle ticks carry host-side
        # acceptance state, and the paged tick syncs on kv.pos anyway.
        self._inflight = None
        self.double_buffer = bool(int(os.environ.get(
            "POWERSERVE_DOUBLE_BUFFER",
            str(int(getattr(self.hp, "double_buffer", True))))))
        self._mk_jits()

    # -- jitted steps -------------------------------------------------------

    def _mk_jits(self) -> None:
        llm = self.cfg.llm
        backend = self.backend
        vocab = llm.vocab_size

        if self.pp_mesh is not None:
            from ..parallel.pp import pp_forward

            pp_mesh = self.pp_mesh

            def step_fwd(params, kv, tokens, positions, active, mode):
                return pp_forward(params, llm, kv, tokens, positions,
                                  mesh=pp_mesh, active=active,
                                  backend=backend, logits_mode=mode)
        elif self.tp_mesh is not None:
            from ..parallel.tp import tp_forward

            tp_mesh = self.tp_mesh

            def step_fwd(params, kv, tokens, positions, active, mode):
                return tp_forward(params, llm, kv, tokens, positions,
                                  mesh=tp_mesh, active=active,
                                  backend=backend, logits_mode=mode)
        else:
            def step_fwd(params, kv, tokens, positions, active, mode):
                return forward(params, llm, kv, tokens, positions,
                               active=active, backend=backend,
                               logits_mode=mode)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def prefill_chunk(params, kv, tokens, positions, active):
            return step_fwd(params, kv, tokens, positions, active, "none")

        if self.pp_mesh is not None:
            from ..parallel.pp import pp_forward as _ppf

            @functools.partial(jax.jit, donate_argnums=(1,))
            def mm_prefill_chunk(params, kv, tokens, positions, active,
                                 embeds, use_embeds):
                """Embedding-overlay prefill through the pipeline: the
                overlay happens on stage 0 inside pp_forward."""
                return _ppf(params, llm, kv, tokens, positions,
                            mesh=self.pp_mesh, active=active,
                            backend=backend, logits_mode="none",
                            embeds=embeds, use_embeds=use_embeds)
        elif self.tp_mesh is not None:
            from ..parallel.tp import tp_forward as _tpf

            @functools.partial(jax.jit, donate_argnums=(1,))
            def mm_prefill_chunk(params, kv, tokens, positions, active,
                                 embeds, use_embeds):
                """Embedding-overlay prefill inside the shard_map (the
                overlay runs per-shard after the vocab-sharded lookup,
                parallel/tp.py tp_forward embeds path)."""
                return _tpf(params, llm, kv, tokens, positions,
                            mesh=self.tp_mesh, active=active,
                            backend=backend, logits_mode="none",
                            embeds=embeds, use_embeds=use_embeds)
        else:
            @functools.partial(jax.jit, donate_argnums=(1,))
            def mm_prefill_chunk(params, kv, tokens, positions, active,
                                 embeds, use_embeds):
                """Prefill with per-slot embedding overlay: slots flagged in
                use_embeds take their rows from `embeds` (vision features at
                image-token positions); the rest use the embedding table."""
                x = params.embed.lookup(tokens).astype(jnp.bfloat16)
                x = jnp.where(use_embeds[:, None, None],
                              embeds.astype(jnp.bfloat16), x)
                return forward(params, llm, kv, tokens, positions,
                               active=active, backend=backend,
                               logits_mode="none", embeds=x)

        horizon = max(int(getattr(self.hp, "decode_horizon", 1)), 1)

        n_top = 8  # top-logprob alternatives recorded per step

        # window decode (engine/loops.py): in-flight K/V live in a small
        # carried window and commit in ONE post-scan scatter, keeping
        # the big cache buffers loop-invariant — committing into a
        # >=2^25-byte scan-CARRIED buffer every step makes XLA drop
        # in-place aliasing (+2-3 ms/step, the measured L=32 cliff;
        # 70.6 -> 88.3 tok/s engine-level when fixed). Runs on the plain
        # dense path, the shard_map tp path (the window shards like
        # the cache — heads over tp, slots over dp — and each shard pays
        # the same carried-scatter cliff the window removes), AND the
        # GSPMD mesh path (the window/commit are ordinary XLA ops that
        # auto-partition like the cache they mirror), AND the paged pool
        # (forward's paged deferred branch widens the state-mode flash
        # kernel's in-flight partition with the window lanes; the commit
        # scatters once through the page table — _ensure_decode_pages
        # already reserves `horizon` positions before each tick), AND
        # pp ticks (parallel/pp.py pp_forward window mode — each
        # stage's cache slice stays loop-invariant, blocks come back
        # layer-sharded), AND sp-in-tp (gqa_attention_quant_sp_deferred
        # merges the in-flight partition on shard 0 before the
        # cross-shard softmax merge).
        from .loops import (_DECODE_LOOP_DEFAULT, commit_kv_window,
                            make_kv_window, push_kv_window,
                            window_eligible)

        use_window = (_DECODE_LOOP_DEFAULT == "window"
                      and window_eligible(self.kv, self.params))
        self.decode_window = use_window
        if self.pp_mesh is not None:
            from ..parallel.pp import pp_forward as _ppfw

            pp_mesh = self.pp_mesh

            def step_fwd_window(params, kvi, tok, positions, active,
                                wins, i):
                return _ppfw(params, llm, kvi, tok, positions,
                             mesh=pp_mesh, active=active,
                             backend=backend, logits_mode="last",
                             kv_update="window", inflight=wins + (i,))
        elif self.tp_mesh is not None:
            from ..parallel.tp import tp_forward as _tpfw

            tp_mesh = self.tp_mesh

            def step_fwd_window(params, kvi, tok, positions, active,
                                wins, i):
                return _tpfw(params, llm, kvi, tok, positions,
                             mesh=tp_mesh, active=active,
                             backend=backend, logits_mode="last",
                             kv_update="window", inflight=wins + (i,))
        else:
            def step_fwd_window(params, kvi, tok, positions, active,
                                wins, i):
                return forward(params, llm, kvi, tok, positions,
                               active=active, backend=backend,
                               logits_mode="last", kv_update="window",
                               inflight=wins + (i,))
        import dataclasses as _dc

        @functools.partial(jax.jit, donate_argnums=(1, 3))
        def decode_all(params, kv, tokens, penalty, rngs, active,
                       temp, top_k, top_p, pen_rep, pen_freq, pen_pres):
            """`horizon` decode steps in one device dispatch; tokens past
            a slot's stop are discarded host-side (the slot resets, so no
            KV fixup is needed). rngs: per-slot raw keys [S, 2]. Also
            returns log-softmax of the RAW model logits for the chosen
            token and the top-8 alternatives (the OpenAI `logprobs`
            fields report the model distribution, not the post-penalty/
            temperature sampling distribution)."""
            if use_window:
                wins0 = make_kv_window(kv, llm, tokens.shape[0], horizon)
                pos0 = kv.pos.astype(jnp.int32)

            def sample(logits, penalty, rngs):
                split = jax.vmap(lambda k: jax.random.split(k, 2))(rngs)
                rngs, subs = split[:, 0], split[:, 1]
                nxt = sample_logits_batched(
                    subs[0], logits, temp, top_k, top_p, state=penalty,
                    penalty_repeat=pen_rep, penalty_freq=pen_freq,
                    penalty_present=pen_pres, vocab_size=vocab, keys=subs
                ).astype(jnp.int32)
                penalty = penalty.push(nxt, active)
                lf = logits.astype(jnp.float32)[:, :vocab]
                lse = jax.nn.logsumexp(lf, axis=-1)
                lp = jnp.take_along_axis(lf, nxt[:, None], axis=-1)[:, 0] - lse
                tv, ti = jax.lax.top_k(lf, n_top)
                return nxt, penalty, rngs, (lp, ti, tv - lse[:, None])

            def body(carry, _):
                tok, kv, penalty, rngs = carry
                positions = jnp.where(active[:, None],
                                      kv.pos[:, None].astype(jnp.int32), -1)
                logits, kv = step_fwd(params, kv, tok[:, None],
                                      positions, active, "last")
                nxt, penalty, rngs, aux = sample(logits, penalty, rngs)
                return (nxt, kv, penalty, rngs), (nxt,) + aux

            def body_window(carry, i):
                tok, pos, mask, wins, penalty, rngs = carry
                positions = jnp.where(active[:, None],
                                      pos[:, None].astype(jnp.int32), -1)
                kvi = _dc.replace(kv, mask=mask, pos=pos)
                logits, kvo, blk = step_fwd_window(
                    params, kvi, tok[:, None], positions, active, wins, i)
                wins = push_kv_window(wins, blk, i)
                nxt, penalty, rngs, aux = sample(logits, penalty, rngs)
                return (nxt, kvo.pos, kvo.mask, wins, penalty,
                        rngs), (nxt,) + aux

            if use_window:
                (_, pos_f, mask_f, wins, penalty, rngs), ys = jax.lax.scan(
                    body_window, (tokens, kv.pos, kv.mask, wins0, penalty,
                                  rngs), jnp.arange(horizon))
                kv = commit_kv_window(kv, wins, pos0, pos_f, mask_f,
                                      active=active)
            else:
                (_, kv, penalty, rngs), ys = jax.lax.scan(
                    body, (tokens, kv, penalty, rngs), None,
                    length=horizon)
            toks, lps, ti, tlp = ys
            # -> [S, horizon(, n_top)]
            return (toks.T, lps.T, ti.transpose(1, 0, 2),
                    tlp.transpose(1, 0, 2), kv, penalty, rngs)

        self._prefill_chunk = prefill_chunk
        self._mm_prefill_chunk = mm_prefill_chunk
        self._decode_all = decode_all
        self.horizon = horizon
        self.n_top = n_top
        if self.is_eagle:
            self._mk_eagle_jits()
        elif self.dparams is not None:
            self._mk_spec_jits()

    def _mk_spec_jits(self) -> None:
        llm = self.cfg.llm
        d_llm = self.d_llm
        backend = self.backend

        # NOTE: dparams is a jit ARGUMENT, not a closure capture — a
        # captured pytree of weights would be lowered as multi-GB
        # constants (catastrophic compile + HBM duplication, and for
        # self-drafting it would duplicate the whole target model)

        # spec x pp: ONE pp_forward partial reused for target and draft
        # (static jit keys — a fresh partial per tick would retrace)
        self._spec_fwd = None
        if self.pp_mesh is not None:
            from ..parallel.pp import pp_forward as _ppf

            self._spec_fwd = functools.partial(_ppf, mesh=self.pp_mesh)

        if self.pp_mesh is not None:
            ppf = self._spec_fwd

            @functools.partial(jax.jit, donate_argnums=(2, 3))
            def spec_prefill_chunk(params, dparams, kv, d_kv, tokens,
                                   positions, active):
                _, kv = ppf(params, llm, kv, tokens, positions,
                            active=active, backend=backend,
                            logits_mode="none")
                _, d_kv = ppf(dparams, d_llm, d_kv, tokens, positions,
                              active=active, backend=backend,
                              logits_mode="none")
                return kv, d_kv
        elif self.tp_mesh is not None:
            from ..parallel.tp import tp_forward as _tpf

            tp_mesh = self.tp_mesh

            @functools.partial(jax.jit, donate_argnums=(2, 3))
            def spec_prefill_chunk(params, dparams, kv, d_kv, tokens,
                                   positions, active):
                _, kv = _tpf(params, llm, kv, tokens, positions,
                             mesh=tp_mesh, active=active,
                             backend=backend, logits_mode="none")
                _, d_kv = _tpf(dparams, d_llm, d_kv, tokens, positions,
                               mesh=tp_mesh, active=active,
                               backend=backend, logits_mode="none")
                return kv, d_kv
        else:
            @functools.partial(jax.jit, donate_argnums=(2, 3))
            def spec_prefill_chunk(params, dparams, kv, d_kv, tokens,
                                   positions, active):
                _, kv = forward(params, llm, kv, tokens, positions,
                                active=active, backend=backend,
                                logits_mode="none")
                _, d_kv = forward(dparams, d_llm, d_kv, tokens, positions,
                                  active=active, backend=backend,
                                  logits_mode="none")
                return kv, d_kv

        self.spec_horizon = max(int(getattr(self.hp, "spec_horizon", 1)), 1)
        # speculation topology: hp.spec_tree widths, or a spec_k-chain.
        # Per spec step every slot drafts the template's tree (one
        # batched draft forward per level), ONE batched target forward
        # verifies all slots' trees, and acceptance/commit is per-slot —
        # speculative/device_tree.py runs spec_horizon such steps in a
        # single device dispatch.
        from ..speculative.device_tree import TreeTemplate

        widths = ([int(w) for w in self.hp.spec_tree.split(",")]
                  if getattr(self.hp, "spec_tree", "") else [1] * self.spec_k)
        self.spec_template = TreeTemplate.from_widths(widths)
        if self.pp_mesh is not None:
            tpl = self.spec_template
            assert tpl.n_nodes == tpl.max_depth + 1, \
                "spec x pp supports CHAIN templates only (tree " \
                "verification needs vis_override, absent from the " \
                "staged pipeline)"
        self._spec_prefill_chunk = spec_prefill_chunk
        if self.mm_dim:
            self._mk_spec_mm_prefill()

    def _mk_spec_mm_prefill(self) -> None:
        """VLM x speculation prefill: both models consume the SAME
        per-slot embedding overlay (vision features at image-token
        positions), so drafted continuations condition on the image
        exactly like the target — acceptance stays lossless."""
        llm = self.cfg.llm
        d_llm = self.d_llm
        backend = self.backend

        if self.pp_mesh is not None:
            ppf = self._spec_fwd

            @functools.partial(jax.jit, donate_argnums=(2, 3))
            def spec_mm_prefill_chunk(params, dparams, kv, d_kv, tokens,
                                      positions, active, embeds,
                                      use_embeds):
                _, kv = ppf(params, llm, kv, tokens, positions,
                            active=active, backend=backend,
                            logits_mode="none", embeds=embeds,
                            use_embeds=use_embeds)
                _, d_kv = ppf(dparams, d_llm, d_kv, tokens, positions,
                              active=active, backend=backend,
                              logits_mode="none", embeds=embeds,
                              use_embeds=use_embeds)
                return kv, d_kv
        elif self.tp_mesh is not None:
            from ..parallel.tp import tp_forward as _tpf

            tp_mesh = self.tp_mesh

            @functools.partial(jax.jit, donate_argnums=(2, 3))
            def spec_mm_prefill_chunk(params, dparams, kv, d_kv, tokens,
                                      positions, active, embeds,
                                      use_embeds):
                _, kv = _tpf(params, llm, kv, tokens, positions,
                             mesh=tp_mesh, active=active,
                             backend=backend, logits_mode="none",
                             embeds=embeds, use_embeds=use_embeds)
                _, d_kv = _tpf(dparams, d_llm, d_kv, tokens, positions,
                               mesh=tp_mesh, active=active,
                               backend=backend, logits_mode="none",
                               embeds=embeds, use_embeds=use_embeds)
                return kv, d_kv
        else:
            @functools.partial(jax.jit, donate_argnums=(2, 3))
            def spec_mm_prefill_chunk(params, dparams, kv, d_kv, tokens,
                                      positions, active, embeds,
                                      use_embeds):
                def overlay(p):
                    x = p.embed.lookup(tokens).astype(jnp.bfloat16)
                    return jnp.where(use_embeds[:, None, None],
                                     embeds.astype(jnp.bfloat16), x)

                _, kv = forward(params, llm, kv, tokens, positions,
                                active=active, backend=backend,
                                logits_mode="none",
                                embeds=overlay(params))
                _, d_kv = forward(dparams, d_llm, d_kv, tokens, positions,
                                  active=active, backend=backend,
                                  logits_mode="none",
                                  embeds=overlay(dparams))
                return kv, d_kv

        self._spec_mm_prefill_chunk = spec_mm_prefill_chunk

    def _mk_eagle_jits(self) -> None:
        llm = self.cfg.llm
        e_llm = self.e_llm
        backend = self.backend
        from ..speculative.eagle import eagle_forward

        if self.pp_mesh is not None:
            # EAGLE x pipeline: target prefill/verify run through the
            # staged pp_forward; the tiny head + its cache replicate
            # across stages and consume the psum-replicated features
            from ..parallel.pp import pp_forward as _ppf

            pp_mesh = self.pp_mesh
            self._spec_fwd = functools.partial(_ppf, mesh=pp_mesh)

            @functools.partial(jax.jit, donate_argnums=(2, 3, 7),
                               static_argnames=("mm",))
            def eagle_prefill_chunk(params, eparams, kv, e_kv, tokens,
                                    positions, active, last_feat, n_real,
                                    embeds=None, use_embeds=None,
                                    mm: bool = False):
                _, kv, feats = _ppf(
                    params, llm, kv, tokens, positions, mesh=pp_mesh,
                    active=active, backend=backend, logits_mode="none",
                    embeds=embeds if mm else None,
                    use_embeds=use_embeds if mm else None,
                    return_final_hidden=True)
                feats = feats.astype(jnp.float32)
                head_feats = jnp.concatenate(
                    [last_feat[:, None, :], feats[:, :-1]], axis=1)
                _, _, e_kv = eagle_forward(
                    eparams, e_llm, e_kv, tokens, head_feats, positions,
                    active=active, backend=backend, logits_mode="none")
                idx = jnp.maximum(n_real - 1, 0)
                new_last = jnp.take_along_axis(
                    feats, idx[:, None, None], axis=1)[:, 0]
                new_last = jnp.where((active & (n_real > 0))[:, None],
                                     new_last, last_feat)
                return kv, e_kv, new_last

            self._eagle_prefill_chunk = eagle_prefill_chunk
            self._finish_eagle_jits()
            return

        if self.tp_mesh is not None:
            # EAGLE x shard_map tp: the prefill pair runs inside one
            # shard_map (parallel/tp.py tp_eagle_prefill); the decode
            # tick routes to tp_eagle_(tree_)spec_scan below
            from ..parallel.tp import tp_eagle_prefill

            tp_mesh = self.tp_mesh

            @functools.partial(jax.jit, donate_argnums=(2, 3, 7),
                               static_argnames=("mm",))
            def eagle_prefill_chunk(params, eparams, kv, e_kv, tokens,
                                    positions, active, last_feat, n_real,
                                    embeds=None, use_embeds=None,
                                    mm: bool = False):
                return tp_eagle_prefill(
                    params, eparams, kv, e_kv, tokens, positions,
                    active, last_feat, n_real, llm, e_llm, tp_mesh,
                    backend=backend, embeds=embeds,
                    use_embeds=use_embeds)

            self._eagle_prefill_chunk = eagle_prefill_chunk
            self._finish_eagle_jits()
            return

        @functools.partial(jax.jit, donate_argnums=(2, 3, 7),
                           static_argnames=("mm",))
        def eagle_prefill_chunk(params, eparams, kv, e_kv, tokens,
                                positions, active, last_feat, n_real,
                                embeds=None, use_embeds=None,
                                mm: bool = False):
            """Target prefill chunk + head prefill: the head's query at
            lane 0 pairs with the slot's carried feature (the target
            feature at the previous position); lane i pairs with this
            chunk's feature at lane i-1. Returns the new carried
            feature = the feature at each slot's last REAL lane
            (n_real[s]-1; padded -1 lanes produce garbage features that
            must not leak into the carry).

            mm=True: per-slot embedding overlay on the TARGET input
            (VLM x EAGLE — the head keeps drafting from target features
            + token ids; image positions share the placeholder id, but
            the features carry the vision content and verification
            stays lossless)."""
            x = None
            if mm:
                x = params.embed.lookup(tokens).astype(jnp.bfloat16)
                x = jnp.where(use_embeds[:, None, None],
                              embeds.astype(jnp.bfloat16), x)
            _, kv, feats = forward(params, llm, kv, tokens, positions,
                                   active=active, backend=backend,
                                   logits_mode="none", embeds=x,
                                   return_final_hidden=True)
            feats = feats.astype(jnp.float32)  # [S, C, dim]
            head_feats = jnp.concatenate(
                [last_feat[:, None, :], feats[:, :-1]], axis=1)
            _, _, e_kv = eagle_forward(
                eparams, e_llm, e_kv, tokens, head_feats, positions,
                active=active, backend=backend, logits_mode="none")
            idx = jnp.maximum(n_real - 1, 0)
            new_last = jnp.take_along_axis(
                feats, idx[:, None, None], axis=1)[:, 0]
            new_last = jnp.where((active & (n_real > 0))[:, None],
                                 new_last, last_feat)
            return kv, e_kv, new_last

        self._eagle_prefill_chunk = eagle_prefill_chunk
        self._finish_eagle_jits()

    def _finish_eagle_jits(self) -> None:
        self.spec_horizon = max(int(getattr(self.hp, "spec_horizon", 1)), 1)
        # hp.spec_tree widths pick an EAGLE-2-style tree topology; ""
        # runs a spec_k chain (cheapest drafting, fewer head forwards)
        self.spec_template = None
        if getattr(self.hp, "spec_tree", ""):
            from ..speculative.device_tree import TreeTemplate

            widths = [int(w) for w in self.hp.spec_tree.split(",")]
            self.spec_template = TreeTemplate.from_widths(widths)

    # -- public API ---------------------------------------------------------

    def submit(self, req: Request) -> Request:
        # fail fast: a non-mm scheduler would silently prefill from the
        # shared image-token id instead of the injected embeddings
        assert req.embeds is None or self.mm_dim > 0, \
            "Request.embeds requires a scheduler built with mm_dim"
        req.id = next(self._ids)
        req.submitted_at = time.time()
        self.pending.put(req)
        self._wake.set()
        return req

    def pin_prefix(self, prefix_ids: list[int]) -> None:
        """Mark a prefix so its KV snapshot is pinned in the prefix
        cache when its prefill completes (HTTP session creation)."""
        if self.prefix_cache is not None:
            self._pin_reqs.add(tuple(prefix_ids))

    def insert_prefix(self, prefix_ids: list[int], saved: dict,
                      pin: bool = True) -> None:
        """Insert an externally-built prefix snapshot (session restore
        from disk). `saved` is {"kv": <save_slot_prefix dict>[, "d": ...]}."""
        if self.prefix_cache is not None:
            self.prefix_cache.put(list(prefix_ids), saved, pin=pin)

    def drop_prefix(self, prefix_ids: list[int]) -> bool:
        if self.prefix_cache is None:
            return False
        return self.prefix_cache.drop(list(prefix_ids))

    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True,
                                            name="batch-scheduler")
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    @property
    def n_active(self) -> int:
        return sum(1 for s in self.slots if s.req is not None)

    def _emit(self, req: Request, tok: int | None) -> None:
        """Deliver to the consumer's sink; a consumer that went away
        (closed event loop, dropped generator) must never kill the
        scheduler thread. Also records TTFT (first emitted token) and
        end-to-end latency (finish) for /metrics percentiles."""
        if req.submitted_at:
            if tok is None:
                self._req_latency.append(time.time() - req.submitted_at)
            elif req.n_generated == 1:
                self._ttft.append(time.time() - req.submitted_at)
        try:
            req.sink(tok)
        except Exception:  # noqa: BLE001
            req.cancelled = True

    def _free_slot(self, i: int) -> None:
        """Tear down a slot, returning its pool pages (paged mode)."""
        if self.pool is not None:
            self.pool.release(i)
            self._pos_known.discard(i)
        self.slots[i] = _Slot()

    def _preempt(self, i: int) -> None:
        """Recompute preemption (vLLM-style): free slot i's pages and
        re-queue its request with prompt = prompt + generated-so-far —
        a later prefill rebuilds the KV exactly, so greedy continuations
        are unchanged and already-emitted tokens are never re-emitted."""
        s = self.slots[i]
        req = s.req
        if req.embeds is not None and s.generated:
            # keep embedding rows aligned with the recompute prompt
            ext = np.asarray(self.params.embed.lookup(
                jnp.asarray([s.generated], jnp.int32))[0], np.float32)
            req.embeds = np.concatenate(
                [np.asarray(req.embeds, np.float32), ext], axis=0)
        req.prompt_ids = list(req.prompt_ids) + s.generated
        self._waitq.appendleft(req)
        self._free_slot(i)
        self.n_preemptions += 1
        log.debug(f"req {req.id}: preempted (paged pool dry)")

    def _seed_pos(self, i: int, pos: int) -> None:
        if self.pool is not None:
            self._pos_drained[i] = min(int(pos), self.max_seq)
            self._pos_known.add(i)

    def _ensure_decode_pages(self, decoding: list[int],
                             extra: int) -> list[int]:
        """Paged mode: grow each decoding slot's page mapping to cover
        this tick's writes. When the pool runs dry, the YOUNGEST
        page-holding request is preempted first (least work lost to
        recompute); a slot that is itself the youngest preempts itself.
        A lone request the pool can't serve finishes with 'length'
        instead of thrashing through re-admit into the same dry pool."""
        pos_host = np.asarray(self.kv.pos)
        for i in decoding:  # exact positions: re-seed the fast-path mirror
            self._seed_pos(i, int(pos_host[i]))
        keep = []
        for i in decoding:
            s = self.slots[i]
            if s.req is None:  # already preempted as a victim this tick
                continue
            while not self.pool.ensure(i, int(pos_host[i]) + extra):
                # dp groups: only same-group victims free useful pages
                grp = self.pool.group_of(i)
                victims = [j for j in range(self.S)
                           if j != i and self.slots[j].req is not None
                           and self.pool.owned[j]
                           and self.pool.group_of(j) == grp]
                if victims:
                    v = max(victims, key=lambda j: self.slots[j].req.id)
                    if self.slots[v].req.id > s.req.id:
                        self._preempt(v)
                        continue  # retry with the freed pages
                    self._preempt(i)
                    break
                s.req.finish_reason = "length"
                self._emit(s.req, None)
                self._free_slot(i)
                break
            else:
                keep.append(i)
        self.kv = self.pool.flush(self.kv)
        # a slot kept earlier can still be chosen as a LATER slot's
        # youngest-victim — drop slots whose request was preempted away
        return [i for i in keep if self.slots[i].req is not None]

    # -- core loop ----------------------------------------------------------

    def _next_pending(self) -> Request | None:
        """Deferred (paged-pool backpressure) requests go first."""
        if self._waitq:
            return self._waitq.popleft()
        try:
            return self.pending.get_nowait()
        except queue.Empty:
            return None

    def _admit(self) -> None:
        for i, slot in enumerate(self.slots):
            if slot.req is not None:
                continue
            req = self._next_pending()
            if req is None:
                break
            # clamp client-supplied max_tokens; an unclamped value could
            # flip the truncation slice positive (or empty it entirely)
            # and crash the scheduler thread on prompt_ids[-1]
            req.max_tokens = max(1, min(req.max_tokens, self.max_seq - 1))
            if len(req.prompt_ids) >= self.max_seq:
                keep = max(1, self.max_seq - req.max_tokens - 1)
                req.prompt_ids = req.prompt_ids[-keep:]
                if req.embeds is not None:  # keep rows aligned
                    req.embeds = req.embeds[-keep:]
            if self.pool is not None and not self.pool.ensure(
                    i, len(req.prompt_ids) + 1):
                # pool dry: return any partial grant, hold the request
                # until a resident slot finishes or is preempted
                self.pool.release(i)
                self._waitq.appendleft(req)
                break
            if self.pool is not None:
                # page-table update must reach the device before the
                # prefix restore (and the tick's forwards) read it
                self.kv = self.pool.flush(self.kv)
            slot.req = req
            slot.prefill_off = 0
            slot.prefilling = True
            slot.cur_token = req.prompt_ids[-1]
            slot.generated = []
            self.kv = self.kv.reset_slot(i)
            if self.d_kv is not None:
                self.d_kv = self.d_kv.reset_slot(i)
            if self.is_eagle:
                self.feat = self.feat.at[i].set(0.0)
            if self.prefix_cache is not None and req.embeds is None:
                hit = self.prefix_cache.match(req.prompt_ids[:-1])
                # spec mode requires a matching draft-cache prefix
                # (eagle additionally needs the carried feature)
                if hit is not None and (self.d_kv is None
                                        or "d" in hit[1]) and (
                        not self.is_eagle or "feat" in hit[1]):
                    n, saved = hit
                    self.kv = self.kv.restore_slot_prefix(i, saved["kv"])
                    if self.d_kv is not None:
                        self.d_kv = self.d_kv.restore_slot_prefix(
                            i, saved["d"])
                    if self.is_eagle:
                        self.feat = self.feat.at[i].set(
                            jnp.asarray(saved["feat"]["v"]))
                    slot.prefill_off = n
                    log.debug(f"req {req.id}: prefix cache hit ({n} tok)")
            self.penalty = self.penalty.reset_slot(i)
            if (req.penalty_repeat != 1.0 or req.penalty_freq
                    or req.penalty_present):
                # penalties count PROMPT tokens too (reference
                # RepeatPenalty accepts prompt tokens during prefill;
                # same as the single-stream engine, generator.py)
                self.penalty = self.penalty.seed_slot(i, req.prompt_ids)
            seed = req.seed if req.seed is not None \
                else self.hp.sampler.seed + req.id * 7919 + i
            self.rngs = self.rngs.at[i].set(jax.random.PRNGKey(seed))
            self.n_requests += 1
            self.n_prompt_tokens += len(req.prompt_ids)
            log.debug(f"req {req.id} -> slot {i}")

    def _prefill_tick(self) -> bool:
        """Advance every prefilling slot by one chunk. True if any ran."""
        C = self.chunk
        tokens = np.zeros((self.S, C), np.int32)
        positions = np.full((self.S, C), -1, np.int32)
        active = np.zeros(self.S, bool)
        n_real = np.zeros(self.S, np.int32)
        embeds = None
        use_embeds = np.zeros(self.S, bool)
        if self.mm_dim:
            embeds = np.zeros((self.S, C, self.mm_dim), np.float32)
        ran = False
        stores: list[tuple[int, list[int]]] = []
        for i, slot in enumerate(self.slots):
            if slot.req is None or not slot.prefilling:
                continue
            prompt = slot.req.prompt_ids[:-1]  # last token feeds decode
            off = slot.prefill_off
            part = prompt[off : off + C]
            if not part:
                slot.prefilling = False
                self._seed_pos(i, len(slot.req.prompt_ids) - 1)
                continue
            tokens[i, :len(part)] = part
            positions[i, :len(part)] = off + np.arange(len(part))
            active[i] = True
            n_real[i] = len(part)
            if self.mm_dim and slot.req.embeds is not None:
                embeds[i, :len(part)] = np.asarray(
                    slot.req.embeds[off : off + len(part)], np.float32)
                use_embeds[i] = True
            slot.prefill_off += len(part)
            if slot.prefill_off >= len(prompt):
                slot.prefilling = False
                self._seed_pos(i, len(slot.req.prompt_ids) - 1)
                if self.prefix_cache is not None \
                        and slot.req.embeds is None:
                    stores.append((i, prompt[:slot.prefill_off]))
            ran = True
        if ran:
            if self.mm_dim and use_embeds.any() and self.is_eagle:
                self.kv, self.d_kv, self.feat = self._eagle_prefill_chunk(
                    self.params, self.eparams, self.kv, self.d_kv,
                    jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray(active), self.feat, jnp.asarray(n_real),
                    jnp.asarray(embeds), jnp.asarray(use_embeds), mm=True)
            elif self.mm_dim and use_embeds.any() \
                    and self.d_kv is not None:
                self.kv, self.d_kv = self._spec_mm_prefill_chunk(
                    self.params, self.dparams, self.kv, self.d_kv,
                    jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray(active), jnp.asarray(embeds),
                    jnp.asarray(use_embeds))
            elif self.mm_dim and use_embeds.any():
                _, self.kv = self._mm_prefill_chunk(
                    self.params, self.kv, jnp.asarray(tokens),
                    jnp.asarray(positions), jnp.asarray(active),
                    jnp.asarray(embeds), jnp.asarray(use_embeds))
            elif self.mm_dim and self.d_kv is None and not self.is_eagle:
                # text-only tick on a VLM scheduler: skip shipping the
                # [S, C, dim] zero embeds tensor over the tunnel
                _, self.kv = self._prefill_chunk(
                    self.params, self.kv, jnp.asarray(tokens),
                    jnp.asarray(positions), jnp.asarray(active))
            elif self.is_eagle:
                self.kv, self.d_kv, self.feat = self._eagle_prefill_chunk(
                    self.params, self.eparams, self.kv, self.d_kv,
                    jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray(active), self.feat, jnp.asarray(n_real))
            elif self.d_kv is not None:
                self.kv, self.d_kv = self._spec_prefill_chunk(
                    self.params, self.dparams, self.kv, self.d_kv,
                    jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray(active))
            else:
                _, self.kv = self._prefill_chunk(
                    self.params, self.kv, jnp.asarray(tokens),
                    jnp.asarray(positions), jnp.asarray(active))
            if self.prefix_cache is not None:
                for i, prefix in stores:
                    pin = tuple(prefix) in self._pin_reqs
                    if pin or len(prefix) >= self.prefix_cache.min_len:
                        saved = {"kv": self.kv.save_slot_prefix(
                            i, len(prefix))}
                        if self.d_kv is not None:
                            saved["d"] = self.d_kv.save_slot_prefix(
                                i, len(prefix))
                        if self.is_eagle:
                            saved["feat"] = {"v": np.asarray(self.feat[i])}
                        self.prefix_cache.put(prefix, saved, pin=pin)
                        self._pin_reqs.discard(tuple(prefix))
        return ran

    def _cancel_tick(self) -> None:
        """Free slots whose consumer aborted (e.g. stop-string match)."""
        for i, s in enumerate(self.slots):
            if s.req is not None and s.req.cancelled:
                if not s.req.finish_reason:
                    s.req.finish_reason = "stop"
                self._emit(s.req, None)
                self._free_slot(i)

    def _spec_decode_tick(self, decoding: list[int]) -> bool:
        """Batched speculation tick (spec x continuous batching).

        Chain templates run STOCHASTIC speculative sampling (sampled
        drafts + rejection-sampling acceptance — far higher tokens/step
        at temperature than exact-match; chain.py docstring); tree
        templates keep exact-match acceptance against the target's
        sampled tokens."""
        from ..speculative.chain import chain_spec_sample_scan
        from ..speculative.device_tree import tree_spec_scan

        tpl = self.spec_template
        if self.pool is not None:
            # a spec step transiently writes up to horizon accepted
            # runs + one un-committed tree/chain past pos; pool ticks
            # stay single-buffered (page decisions need true end state)
            self._drain_inflight()
            need = self.spec_horizon * (tpl.max_depth + 1) + tpl.n_nodes
            decoding = self._ensure_decode_pages(decoding, need)
            if not decoding:
                return True
        tokens = np.zeros(self.S, np.int32)
        active = np.zeros(self.S, bool)
        temp = np.zeros(self.S, np.float32)
        top_k = np.zeros(self.S, np.int32)
        top_p = np.ones(self.S, np.float32)
        for i in decoding:
            s = self.slots[i]
            tokens[i] = s.cur_token
            active[i] = True
            temp[i] = s.req.temperature
            top_k[i] = s.req.top_k
            top_p[i] = s.req.top_p
        tok_in, prev, reqs_now = self._chain_spec_tokens(decoding, tokens)
        common = dict(active=jnp.asarray(active), rngs=self.rngs,
                      temp=jnp.asarray(temp), top_k=jnp.asarray(top_k),
                      top_p=jnp.asarray(top_p))
        if self.pp_mesh is not None:
            # spec x pipeline: the chain scan's forwards run through
            # pp_forward (injectable fwd; chain templates only — the
            # __init__/_mk_spec_jits asserts enforce it)
            (emitted_d, counts, self.kv, self.d_kv, next_tok,
             self.rngs) = chain_spec_sample_scan(
                self.params, self.dparams, self.kv, self.d_kv,
                tok_in, self.cfg.llm, self.d_llm,
                self.spec_horizon, tpl.max_depth, self.backend,
                fwd_t=self._spec_fwd, fwd_d=self._spec_fwd, **common)
        elif self.tp_mesh is not None:
            # spec x shard_map tp: the whole scan runs in one shard_map
            # so each shard's Pallas kernel sees local weights
            from ..parallel.tp import tp_chain_spec_scan, tp_tree_spec_scan

            if tpl.n_nodes == tpl.max_depth + 1:  # pure chain
                (emitted_d, counts, self.kv, self.d_kv, next_tok,
                 self.rngs) = tp_chain_spec_scan(
                    self.params, self.dparams, self.kv, self.d_kv,
                    tok_in, self.cfg.llm, self.d_llm,
                    self.spec_horizon, tpl.max_depth, self.tp_mesh,
                    self.backend, **common)
            else:
                (emitted_d, counts, self.kv, self.d_kv, next_tok,
                 self.rngs) = tp_tree_spec_scan(
                    self.params, self.dparams, self.kv, self.d_kv,
                    tok_in, self.cfg.llm, self.d_llm,
                    self.spec_horizon, tpl.key(), self.tp_mesh,
                    self.backend,
                    sample="wor" if getattr(self.hp, "spec_wor", False)
                    else True, **common)
        elif tpl.n_nodes == tpl.max_depth + 1:  # pure chain
            kk = tpl.max_depth
            (emitted_d, counts, self.kv, self.d_kv, next_tok,
             self.rngs) = chain_spec_sample_scan(
                self.params, self.dparams, self.kv, self.d_kv,
                tok_in, self.cfg.llm, self.d_llm,
                self.spec_horizon, kk, self.backend, **common)
        else:
            (emitted_d, counts, self.kv, self.d_kv, next_tok,
             self.rngs) = tree_spec_scan(
                self.params, self.dparams, self.kv, self.d_kv,
                tok_in, self.cfg.llm, self.d_llm,
                self.spec_horizon, tpl.key(), self.backend,
                sample="wor" if getattr(self.hp, "spec_wor", False)
                else True, **common)
        room = (self.max_seq - self.spec_horizon * (tpl.max_depth + 1)
                - tpl.n_nodes)
        return self._finish_spec_tick(decoding, reqs_now, prev,
                                      emitted_d, counts, next_tok, room)

    def _chain_spec_tokens(self, decoding, tokens):
        """Double-buffered spec ticks: take the in-flight record, chain
        next root tokens on-device for slots still owned by the request
        they were dispatched for, and capture request identities BEFORE
        the drain below can free slots."""
        prev = self._inflight
        self._inflight = None
        reqs_now = [self.slots[i].req for i in decoding]
        tok_in = jnp.asarray(tokens)
        if prev is not None and prev[0] == "spec":
            carry = np.zeros(self.S, bool)
            for j, r in zip(prev[1], prev[2]):
                if self.slots[j].req is r:
                    carry[j] = True
            tok_in = jnp.where(jnp.asarray(carry), prev[3][2], tok_in)
        return tok_in, prev, reqs_now

    def _finish_spec_tick(self, decoding, reqs_now, prev, emitted_d,
                          counts, next_tok, room) -> bool:
        """Drain the previous spec tick (its fetch overlaps this tick's
        device execution), then register this tick as in-flight."""
        handles = (emitted_d, counts, next_tok, self.kv.pos + 0)
        if prev is not None:
            self._drain_inflight_with(prev)
        self._inflight = ("spec", decoding, reqs_now, handles, room)
        if not self.double_buffer or self.pool is not None:
            self._drain_inflight()
        return True

    def _emit_spec_results(self, decoding, emitted_d, counts, next_tok,
                           pos_host, room: int, reqs=None,
                           fetched: bool = False) -> None:
        """Shared per-slot emission walk for the spec ticks: deliver
        each step's accepted tokens, honor stop/cancel/length, tear
        down finished slots. emitted_d [H, S, W]; counts [H, S];
        next_tok [S]; room = last safe write position (spec steps
        transiently write past the committed length). reqs: per-slot
        request identities captured at dispatch (double-buffered spec
        ticks — slots reused since dispatch are skipped)."""
        # ONE batched host fetch (each np.asarray is its own ~0.1-1s
        # round trip over a remote-TPU link). pos_host arrives as the
        # POST-tick value (the pre-tick kv was donated to the scan);
        # the room check needs the PRE-tick committed length, which is
        # post - this tick's per-slot emitted counts (every spec step
        # advances pos by exactly its count).
        if not fetched:
            emitted_d, counts, next_tok, pos_host = jax.device_get(
                (emitted_d, counts, next_tok, pos_host))
        pos_host = pos_host - counts.sum(axis=0)
        if reqs is None:
            reqs = [self.slots[i].req for i in decoding]
        n_active = len(decoding)
        H, W = counts.shape[0], emitted_d.shape[2]
        self.n_spec_steps += H * n_active
        self.n_spec_drafted += H * n_active * (W - 1)
        self.n_spec_accepted += int(counts[:, decoding].sum()) - H * n_active
        for i, req_at in zip(decoding, reqs):
            s = self.slots[i]
            if req_at is None or s.req is not req_at:
                continue  # slot reused since dispatch; results are void
            s.cur_token = int(next_tok[i])
            done = False
            emitted = 0
            for h in range(counts.shape[0]):
                for j in range(int(counts[h, i])):
                    tok = int(emitted_d[h, i, j])
                    emitted += 1
                    s.generated.append(tok)
                    s.req.n_generated += 1
                    self.n_tokens_generated += 1
                    self._emit(s.req, tok)
                    if s.req.cancelled:
                        s.req.finish_reason = s.req.finish_reason or "stop"
                        done = True
                    elif tok in s.req.stop_ids:
                        s.req.finish_reason = "stop"
                        done = True
                    elif s.req.n_generated >= s.req.max_tokens:
                        s.req.finish_reason = "length"
                        done = True
                    elif int(pos_host[i]) + emitted >= room:
                        s.req.finish_reason = "length"
                        done = True
                    if done:
                        break
                if done:
                    break
            if done:
                self._emit(s.req, None)
                self._free_slot(i)

    def _eagle_decode_tick(self, decoding: list[int]) -> bool:
        """Batched EAGLE tick: one dispatch advances every decoding
        slot by spec_horizon spec steps (chain, or hp.spec_tree tree)."""
        from ..speculative.eagle import eagle_spec_scan, eagle_tree_spec_scan

        k = self.spec_k
        if self.spec_template is not None:
            per_step = self.spec_template.max_depth + 1
            transient = self.spec_template.n_nodes
        else:
            per_step = transient = k + 1
        if self.pool is not None:
            self._drain_inflight()  # pool ticks stay single-buffered
            need = self.spec_horizon * per_step + transient
            decoding = self._ensure_decode_pages(decoding, need)
            if not decoding:
                return True
        tokens = np.zeros(self.S, np.int32)
        active = np.zeros(self.S, bool)
        temp = np.zeros(self.S, np.float32)
        top_k = np.zeros(self.S, np.int32)
        top_p = np.ones(self.S, np.float32)
        for i in decoding:
            s = self.slots[i]
            tokens[i] = s.cur_token
            active[i] = True
            temp[i] = s.req.temperature
            top_k[i] = s.req.top_k
            top_p[i] = s.req.top_p
        tok_in, prev, reqs_now = self._chain_spec_tokens(decoding, tokens)
        common = dict(active=jnp.asarray(active), rngs=self.rngs,
                      temp=jnp.asarray(temp), top_k=jnp.asarray(top_k),
                      top_p=jnp.asarray(top_p), sample=True)
        if self.pp_mesh is not None:
            # EAGLE x pipeline: the verify runs through the staged
            # pp_forward partial (trees thread cache_positions + the
            # ancestor intra_mask through it); head forwards stay
            # replicated
            if self.spec_template is not None:
                tpl = self.spec_template
                if getattr(self.hp, "spec_wor", False):
                    common["sample"] = "wor"
                (emitted_d, counts, self.kv, self.d_kv, next_tok,
                 self.feat, self.rngs) = eagle_tree_spec_scan(
                    self.params, self.eparams, self.kv, self.d_kv,
                    tok_in, self.feat, self.cfg.llm, self.e_llm,
                    self.spec_horizon, tpl.key(), self.backend,
                    fwd_t=self._spec_fwd, **common)
            else:
                (emitted_d, counts, self.kv, self.d_kv, next_tok,
                 self.feat, self.rngs) = eagle_spec_scan(
                    self.params, self.eparams, self.kv, self.d_kv,
                    tok_in, self.feat, self.cfg.llm, self.e_llm,
                    self.spec_horizon, k, self.backend,
                    fwd_t=self._spec_fwd, **common)
        elif self.tp_mesh is not None:
            # EAGLE x shard_map tp: the whole scan runs in one
            # shard_map so each shard's Pallas kernel sees local
            # weights (parallel/tp.py)
            from ..parallel.tp import (
                tp_eagle_spec_scan,
                tp_eagle_tree_spec_scan,
            )

            if self.spec_template is not None:
                tpl = self.spec_template
                if getattr(self.hp, "spec_wor", False):
                    common["sample"] = "wor"
                (emitted_d, counts, self.kv, self.d_kv, next_tok,
                 self.feat, self.rngs) = tp_eagle_tree_spec_scan(
                    self.params, self.eparams, self.kv, self.d_kv,
                    tok_in, self.feat, self.cfg.llm, self.e_llm,
                    self.spec_horizon, tpl.key(), self.tp_mesh,
                    self.backend, **common)
            else:
                (emitted_d, counts, self.kv, self.d_kv, next_tok,
                 self.feat, self.rngs) = tp_eagle_spec_scan(
                    self.params, self.eparams, self.kv, self.d_kv,
                    tok_in, self.feat, self.cfg.llm, self.e_llm,
                    self.spec_horizon, k, self.tp_mesh,
                    self.backend, **common)
        elif self.spec_template is not None:
            tpl = self.spec_template
            if getattr(self.hp, "spec_wor", False):
                common["sample"] = "wor"
            (emitted_d, counts, self.kv, self.d_kv, next_tok, self.feat,
             self.rngs) = eagle_tree_spec_scan(
                self.params, self.eparams, self.kv, self.d_kv,
                tok_in, self.feat, self.cfg.llm, self.e_llm,
                self.spec_horizon, tpl.key(), self.backend, **common)
        else:
            (emitted_d, counts, self.kv, self.d_kv, next_tok, self.feat,
             self.rngs) = eagle_spec_scan(
                self.params, self.eparams, self.kv, self.d_kv,
                tok_in, self.feat, self.cfg.llm, self.e_llm,
                self.spec_horizon, k, self.backend, **common)
        room = self.max_seq - self.spec_horizon * per_step - transient
        return self._finish_spec_tick(decoding, reqs_now, prev,
                                      emitted_d, counts, next_tok, room)

    def _drain_inflight(self) -> bool:
        """Fetch + process the results of the in-flight decode tick
        (double-buffered ticks: the fetch of tick N overlaps tick N+1's
        device execution — the reference's NPU execute-while-host-preps
        pattern, causal_models.cpp:298-330). Slots whose request changed
        since dispatch (finished + re-admitted) are skipped: their
        speculative results are garbage by construction and the slot's
        device state was fully re-initialized at admission."""
        inf = self._inflight
        if inf is None:
            return False
        self._inflight = None
        if inf[0] == "spec":
            _, decoding, reqs, handles, room = inf
            emitted_d, counts, next_tok, pos_host = jax.device_get(handles)
            self._emit_spec_results(decoding, emitted_d, counts, next_tok,
                                    pos_host, room, reqs=reqs,
                                    fetched=True)
            return True
        _, decoding, reqs, handles = inf
        toks, lps, top_i, top_lp, pos_host = jax.device_get(handles)
        if self.pool is not None:
            for i, req in zip(decoding, reqs):
                if req is not None and self.slots[i].req is req:
                    # upper bound (tick start + horizon): page grants
                    # may only over-cover, never under-cover
                    self._seed_pos(i, int(pos_host[i]) + self.horizon)
        for i, req in zip(decoding, reqs):
            s = self.slots[i]
            if req is None or s.req is not req:
                continue  # slot reused since dispatch; results are void
            done = False
            for h in range(self.horizon):
                tok = int(toks[i, h])
                s.cur_token = tok
                s.generated.append(tok)
                s.req.n_generated += 1
                self.n_tokens_generated += 1
                if s.req.logprobs > 0:
                    n = min(s.req.logprobs, self.n_top)
                    s.req.token_logprobs.append(float(lps[i, h]))
                    s.req.top_logprobs.append(
                        [(int(t), float(l)) for t, l in
                         zip(top_i[i, h, :n], top_lp[i, h, :n])])
                self._emit(s.req, tok)
                if s.req.cancelled:
                    s.req.finish_reason = s.req.finish_reason or "stop"
                    done = True
                elif tok in s.req.stop_ids:
                    s.req.finish_reason = "stop"
                    done = True
                elif s.req.n_generated >= s.req.max_tokens:
                    s.req.finish_reason = "length"
                    done = True
                elif int(pos_host[i]) + h + 1 >= self.max_seq - 1:
                    s.req.finish_reason = "length"
                    done = True
                if done:
                    break
            if done:
                self._emit(s.req, None)
                self._free_slot(i)
        return True

    def _decode_tick(self) -> bool:
        decoding = [i for i, s in enumerate(self.slots)
                    if s.req is not None and not s.prefilling]
        if not decoding:
            return self._drain_inflight()
        if self.is_eagle:
            return self._eagle_decode_tick(decoding)
        if self.d_kv is not None:
            return self._spec_decode_tick(decoding)
        pool_fast = False
        if self.pool is not None:
            # double-buffered pool ticks (r5): steady-state page
            # grants come from the host position mirror, covering TWO
            # ticks ahead — no per-tick device sync. Falls back to the
            # exact single-buffered path for stale mirrors (fresh
            # admissions) or pool pressure (preemption decisions need
            # true end state; it must not evict an in-flight slot).
            pool_fast = self.double_buffer
            if pool_fast:
                for i in decoding:
                    need = int(self._pos_drained[i]) + 2 * self.horizon
                    if (i not in self._pos_known
                            or not self.pool.ensure(i, need)):
                        pool_fast = False
                        break
                    if self.pool.dirty and self.pool.n_free_for(i) > 2:
                        # opportunistic page batching: a table flush is
                        # a host->device transfer (expensive over a
                        # remote link) — when a grant was needed anyway
                        # and the pool has slack, grab 2 extra pages so
                        # the next flushes land 3 pages later
                        self.pool.ensure(
                            i, need + 2 * self.pool.page_size)
            if pool_fast:
                self.kv = self.pool.flush(self.kv)
            else:
                self.n_pool_slow_ticks += 1
                self._drain_inflight()
                decoding = self._ensure_decode_pages(decoding,
                                                     self.horizon)
                if not decoding:
                    return True  # preemptions / finishes were work
        tokens = np.zeros(self.S, np.int32)
        active = np.zeros(self.S, bool)
        temp = np.zeros(self.S, np.float32)
        top_k = np.zeros(self.S, np.int32)
        top_p = np.ones(self.S, np.float32)
        pen = np.ones(self.S, np.float32)
        pfreq = np.zeros(self.S, np.float32)
        ppres = np.zeros(self.S, np.float32)
        for i in decoding:
            s = self.slots[i]
            tokens[i] = s.cur_token
            active[i] = True
            temp[i] = s.req.temperature
            top_k[i] = s.req.top_k
            top_p[i] = s.req.top_p
            pen[i] = s.req.penalty_repeat
            pfreq[i] = s.req.penalty_freq
            ppres[i] = s.req.penalty_present
        prev = self._inflight
        self._inflight = None
        # capture request identities NOW: draining `prev` below can
        # finish + free slots that are in this tick's decoding set
        reqs_now = [self.slots[i].req for i in decoding]
        tok_in = jnp.asarray(tokens)
        if prev is not None:
            # chain on-device: a slot still owned by the request it was
            # dispatched for takes its next input token straight from
            # the in-flight tick's device output (no host round trip)
            carry = np.zeros(self.S, bool)
            for j, r in zip(prev[1], prev[2]):
                if self.slots[j].req is r:
                    carry[j] = True
            tok_in = jnp.where(jnp.asarray(carry),
                               prev[3][0][:, -1], tok_in)
        (toks, lps, top_i, top_lp, self.kv, self.penalty,
         self.rngs) = self._decode_all(
            self.params, self.kv, tok_in,
            self.penalty, self.rngs, jnp.asarray(active), jnp.asarray(temp),
            jnp.asarray(top_k), jnp.asarray(top_p), jnp.asarray(pen),
            jnp.asarray(pfreq), jnp.asarray(ppres))
        # pos snapshot: +0 copies out of the donated buffer (the NEXT
        # tick donates self.kv, which would invalidate a bare handle)
        handles = (toks, lps, top_i, top_lp, self.kv.pos + 0)
        if prev is not None:
            # process tick N while tick N+1 runs on device (ONE batched
            # host fetch per tick — over a remote-TPU link every
            # np.asarray is its own ~0.1-1s round trip, CLAUDE.md)
            self._drain_inflight_with(prev)
        self._inflight = ("plain", decoding, reqs_now, handles)
        if not self.double_buffer or (self.pool is not None
                                      and not pool_fast):
            self._drain_inflight()
        return True

    def _drain_inflight_with(self, inf) -> None:
        saved, self._inflight = self._inflight, inf
        self._drain_inflight()
        self._inflight = saved

    def step(self) -> bool:
        """One scheduler iteration; returns True if work was done.

        Prefill has priority (new requests start fast), but decoding
        slots are guaranteed a tick at least every `decode_every`
        iterations — otherwise a continuous stream of long prompts
        starves in-flight generations entirely."""
        self._cancel_tick()
        self._admit()
        self._tick = getattr(self, "_tick", 0) + 1
        every = max(int(getattr(self.hp, "decode_every", 2)), 1)
        if self._prefill_tick():
            if self._tick % every == 0:
                self._decode_tick()
            return True
        return self._decode_tick()

    @staticmethod
    def _pct(window, q: float) -> float:
        if not window:
            return 0.0
        xs = sorted(window)
        return xs[min(int(q * len(xs)), len(xs) - 1)]

    def metrics(self) -> dict:
        """Counters + latency percentiles for the /metrics endpoint.
        Percentiles are over sliding windows of the last 512 requests:
        ttft = submit -> first emitted token, latency = submit -> done."""
        up = max(time.time() - self.started_at, 1e-9)
        out = {
            "requests_total": self.n_requests,
            "prompt_tokens_total": self.n_prompt_tokens,
            "generated_tokens_total": self.n_tokens_generated,
            "slots_active": self.n_active,
            "slots_total": self.S,
            "queue_depth": self.pending.qsize(),
            "uptime_seconds": up,
            "generated_tokens_per_second": self.n_tokens_generated / up,
            "prefix_cache_hits": (self.prefix_cache.hits
                                  if self.prefix_cache else 0),
            "prefix_cache_misses": (self.prefix_cache.misses
                                    if self.prefix_cache else 0),
        }
        if self.pool is not None:
            out["paged_pages_total"] = self.pool.n_pages
            out["paged_pages_free"] = self.pool.n_free
            out["paged_slow_ticks"] = self.n_pool_slow_ticks
            out["paged_preemptions_total"] = self.n_preemptions
            out["paged_deferred_requests"] = len(self._waitq)
        if self.n_spec_steps:
            out["spec_steps_total"] = self.n_spec_steps
            out["spec_drafted_total"] = self.n_spec_drafted
            out["spec_accepted_total"] = self.n_spec_accepted
            out["spec_accept_rate"] = (self.n_spec_accepted
                                       / max(self.n_spec_drafted, 1))
            out["spec_tokens_per_step"] = (
                (self.n_spec_accepted + self.n_spec_steps)
                / self.n_spec_steps)
        for name, win in (("ttft_seconds", self._ttft),
                          ("request_latency_seconds", self._req_latency)):
            for q in (0.5, 0.9, 0.99):
                out[f"{name}_p{int(q * 100)}"] = self._pct(win, q)
        return out

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                busy = self.step()
            except Exception:  # noqa: BLE001
                # a single bad request must not take the engine down:
                # fail all in-flight requests, keep serving
                log.exception("scheduler step failed; resetting slots")
                for i, s in enumerate(self.slots):
                    if s.req is not None:
                        s.req.finish_reason = "error"
                        self._emit(s.req, None)
                        self._free_slot(i)
                busy = False
            if not busy:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
