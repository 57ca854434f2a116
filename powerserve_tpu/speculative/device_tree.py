"""On-device BATCHED token-tree speculation.

Generalizes speculative/chain.py (width-1 trees) to static tree
topologies while keeping the whole draft->verify->accept->commit cycle
inside one jitted lax.scan — one host dispatch per block of speculative
steps, for every slot at once. The reference grows its token tree on
the host with one draft forward per node and a per-node accept loop
(src/speculative/token_tree.cpp:82-229); here the topology is a static
template so each tree level is ONE batched draft forward, verification
is ONE target forward with the ancestor intra-mask, and acceptance is a
vectorized walk over static child tables.

Trees raise tokens/step over chains at equal verify cost: siblings let
the draft hedge across its top-k at each depth, so one mispredicted
argmax no longer kills the whole tail.

KV bookkeeping per step (c = committed length per slot):
  - node i is written at cache position c + i in both caches; its rope
    position is c + depth(i)
  - draft level forwards see (committed prefix) + (own ancestors) via a
    per-query visibility override; every level is forwarded (the last
    one only to write its KV) so the draft cache stays complete when a
    full path is accepted
  - after verify both caches roll back to c and the accepted chain's
    entries compact to the front (kv/cache.py:commit_tokens)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LLMConfig, ModelConfig
from ..kv.cache import KVCache
from ..models.llama import LlamaParams, forward
from .engine import SpecStats

__all__ = ["TreeTemplate", "tree_spec_scan", "DeviceTreeEngine"]


class TreeTemplate:
    """Static speculation-tree topology.

    parents[i] is the node index of i's parent (parents[0] == -1: node
    0 is the root, holding the last committed token); nodes are in
    BFS order (parent < child). ranks[i] selects which draft candidate
    the child takes: the rank-r child of p gets the draft's r-th most
    probable token after p. Ranks within one parent must be 0..w-1.
    """

    def __init__(self, parents, ranks):
        parents = list(parents)
        ranks = list(ranks)
        N = len(parents)
        if N < 1 or parents[0] != -1:
            raise ValueError("node 0 must be the root (parent -1)")
        if len(ranks) != N:
            raise ValueError(f"{len(ranks)} ranks for {N} nodes")
        depths = [0] * N
        children: list[list[tuple[int, int]]] = [[] for _ in range(N)]
        for i in range(1, N):
            p = parents[i]
            if not 0 <= p < i:
                raise ValueError(f"node {i}: parent {p} must precede it")
            depths[i] = depths[p] + 1
            children[p].append((ranks[i], i))
        for p in range(N):
            children[p].sort()
            got = [r for r, _ in children[p]]
            if got != list(range(len(got))):
                raise ValueError(f"node {p}: child ranks {got} not 0..w-1")
        self.parents = parents
        self.ranks = ranks
        self.n_nodes = N
        self.depths = np.asarray(depths, np.int32)
        self.max_depth = int(self.depths.max())
        # levels[d] = node indices at depth d (ascending)
        self.levels = [np.asarray([i for i in range(N) if depths[i] == d],
                                  np.int32)
                       for d in range(self.max_depth + 1)]
        # child table [N, Cmax] (-1 pad), columns in rank order — the
        # acceptance walk prefers lower ranks on ties, matching the
        # reference's most-probable-first ordering
        cmax = max((len(ch) for ch in children), default=0)
        self.max_children = max(cmax, 1)
        tab = np.full((N, self.max_children), -1, np.int32)
        for p in range(N):
            for r, i in children[p]:
                tab[p, r] = i
        self.child_table = tab
        # ancestor-or-self mask [N, N]
        anc = np.zeros((N, N), bool)
        for i in range(N):
            j = i
            while j >= 0:
                anc[i, j] = True
                j = parents[j]
        self.anc = anc
        # per-level draft assignments: (row-in-level, child, rank)
        self.assignments = []
        for d in range(self.max_depth + 1):
            lev = self.levels[d]
            rows = {int(n): r for r, n in enumerate(lev)}
            a = [(rows[p], i, r)
                 for p in lev for r, i in children[int(p)]]
            self.assignments.append(a)
        # top-k width needed at each level's draft
        self.level_topk = [max((r for _, _, r in a), default=-1) + 1
                          for a in self.assignments]

    @classmethod
    def from_widths(cls, widths) -> "TreeTemplate":
        """Every node at depth d gets widths[d] children.

        from_widths([1]*k) is the k-chain; from_widths([2, 1, 1]) hedges
        the first step across the draft's top-2."""
        parents, ranks = [-1], [0]
        level = [0]
        for w in widths:
            nxt = []
            for p in level:
                for r in range(int(w)):
                    nxt.append(len(parents))
                    parents.append(p)
                    ranks.append(r)
            level = nxt
        return cls(parents, ranks)

    def key(self) -> tuple:
        return (tuple(self.parents), tuple(self.ranks))


def _level_visibility(mask0: jax.Array, anc_rows: np.ndarray,
                      c: jax.Array, T: int) -> jax.Array:
    """vis[s, q, t] = committed-prefix mask | (t == c_s + j for any
    ancestor-or-self j of query q)."""
    S = c.shape[0]
    N = anc_rows.shape[1]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (S, N, T), 2)
    eq = t_iota == (c[:, None, None] + jnp.arange(N)[None, :, None])
    vis_anc = jnp.einsum("qj,sjt->sqt",
                         jnp.asarray(anc_rows, jnp.float32),
                         eq.astype(jnp.float32)) > 0.5
    return mask0[:, None, :] | vis_anc


def _wor_accept_walk(tokens, q_dists, p_dists, tpl, child_tab, active,
                     u_keys, r_keys, root):
    """Recursive-rejection acceptance over rank-ordered WOR candidates.

    tokens [S, N] drafted tree tokens; q_dists/p_dists [S, N, V] draft/
    target post-transform distributions per node; u_keys [S, D, 2]
    accept-coin keys; r_keys [S, D+1, 2] residual-sample keys.
    Returns (chain_m [S, D+1] accepted node ids (-1 dead), n_acc,
    final_tok [S] — the residual/bonus sample emitted after the last
    accepted node). Shared by the model-draft and EAGLE tree scans.
    """
    from ..sampling.sampler import categorical_from_dist

    S, N = tokens.shape
    D = tpl.max_depth
    srows = jnp.arange(S)
    cur = jnp.zeros(S, jnp.int32)
    alive = active
    final_tok = root
    p_res = p_dists[:, 0]
    chain = [cur]
    for step in range(D):
        cand = child_tab[cur]  # [S, Cmax] rank order
        q_t = jnp.take_along_axis(
            q_dists, cur[:, None, None], axis=1)[:, 0]  # [S, V]
        u = jax.vmap(lambda r: jax.random.uniform(
            r, (tpl.max_children,)))(u_keys[:, step])
        accepted = jnp.zeros(S, bool)
        chosen = cur
        for t in range(tpl.max_children):
            ch = cand[:, t]
            x_t = jnp.take_along_axis(
                tokens, jnp.maximum(ch, 0)[:, None], axis=1)[:, 0]
            qx = q_t[srows, x_t]
            px = p_res[srows, x_t]
            # a child only counts as a real draw if it exists and
            # still has q-mass (WOR can exhaust the support)
            real = alive & ~accepted & (ch >= 0) & (qx > 1e-12)
            acc = real & (u[:, t] * qx < px)
            chosen = jnp.where(acc, ch, chosen)
            accepted = accepted | acc
            rej = real & ~acc
            p_new = jnp.maximum(p_res - q_t, 0.0)
            ps = p_new.sum(-1, keepdims=True)
            p_new = jnp.where(ps > 1e-12,
                              p_new / jnp.maximum(ps, 1e-30), p_res)
            p_res = jnp.where(rej[:, None], p_new, p_res)
            q_z = q_t.at[srows, x_t].set(0.0)
            qs = q_z.sum(-1, keepdims=True)
            q_z = jnp.where(qs > 1e-12,
                            q_z / jnp.maximum(qs, 1e-30), q_z)
            q_t = jnp.where(rej[:, None], q_z, q_t)
        res = categorical_from_dist(r_keys[:, step],
                                    p_res).astype(jnp.int32)
        stopped = alive & ~accepted
        final_tok = jnp.where(stopped, res, final_tok)
        chain.append(jnp.where(accepted, chosen, -1))
        p_next = jnp.take_along_axis(
            p_dists, jnp.maximum(chosen, 0)[:, None, None], axis=1)[:, 0]
        p_res = jnp.where(accepted[:, None], p_next, p_res)
        cur = jnp.where(accepted, chosen, cur)
        alive = alive & accepted
    # leaves (or a fully-accepted path) emit the bonus/residual
    res = categorical_from_dist(r_keys[:, D], p_res).astype(jnp.int32)
    final_tok = jnp.where(alive, res, final_tok)
    chain_m = jnp.stack(chain, axis=1)  # [S, D+1]
    n_acc = jnp.sum(chain_m[:, 1:] >= 0, axis=1)
    return chain_m, n_acc, final_tok


def _wor_emit(tokens, chain_m, n_acc, final_tok, active, root):
    """Emitted stream for a WOR step: accepted draft tokens along the
    chain, then the residual/bonus sample; -1 beyond. Returns
    (emit [S, D+1], new_root [S])."""
    S = tokens.shape[0]
    D1 = chain_m.shape[1]
    child_nodes = chain_m[:, 1:]
    acc_toks = jnp.take_along_axis(
        tokens, jnp.maximum(child_nodes, 0), axis=1)
    acc_toks = jnp.where(child_nodes >= 0, acc_toks, -1)
    emit = jnp.concatenate(
        [acc_toks, jnp.full((S, 1), -1, jnp.int32)], axis=1)
    lane = jnp.arange(D1, dtype=jnp.int32)[None, :]
    emit = jnp.where(lane == n_acc[:, None], final_tok[:, None], emit)
    emit = jnp.where(active[:, None], emit, -1)
    new_root = jnp.where(active, final_tok, root)
    return emit, new_root


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "d_llm", "n_steps", "tree_key", "backend",
                     "sample", "tp_axis"),
    donate_argnums=(2, 3),
)
def tree_spec_scan(tparams: LlamaParams, dparams: LlamaParams,
                   t_kv: KVCache, d_kv: KVCache, root: jax.Array,
                   t_llm: LLMConfig, d_llm: LLMConfig, n_steps: int,
                   tree_key: tuple, backend: str = "auto",
                   active: jax.Array | None = None,
                   rngs: jax.Array | None = None,
                   temp: jax.Array | None = None,
                   top_k: jax.Array | None = None,
                   top_p: jax.Array | None = None,
                   sample: bool = False,
                   tp_axis: str | None = None):
    """n_steps batched tree-speculation steps in one dispatch.

    root: [S] int32 last committed token per slot. tree_key: a
    TreeTemplate.key() (static).

    sample modes:
      False  — greedy argmax verification, greedy top-k drafting.
      True   — EXACT-MATCH stochastic: target samples one token per
               node with the slot's sampler params; a child is accepted
               iff its greedy-top-k drafted token equals the target's
               sample. Lossless (emitted tokens ARE target samples).
      "wor"  — SpecInfer-style multi-candidate speculative sampling:
               children are SAMPLED WITHOUT REPLACEMENT from the
               draft's post-transform distribution q (Gumbel top-k),
               and verification is recursive rejection over the rank
               order — accept child t w.p. min(1, p_t(x_t)/q_t(x_t)),
               on rejection p_{t+1} = norm((p_t - q_t)^+) and q_{t+1} =
               norm(q_t minus x_t) [the without-replacement
               adjustment]; if every child rejects, emit a residual
               sample and stop. Marginals are exactly the target's
               (TV-tested), and acceptance on FLAT distributions beats
               exact-match by roughly the summed q-mass of the
               candidate set. Net-new vs the reference's greedy verify
               (token_tree.cpp:213-229).

    Returns (emitted [n_steps, S, D+1], counts [n_steps, S], t_kv,
    d_kv, root, rngs): step i emitted emitted[i, s, :counts[i, s]].
    """
    tpl = TreeTemplate(*tree_key)
    N, D = tpl.n_nodes, tpl.max_depth
    S = root.shape[0]
    if active is None:
        active = jnp.ones(S, bool)
    if rngs is None:
        rngs = jnp.zeros((S, 2), jnp.uint32)
    depths = jnp.asarray(tpl.depths)
    idx_arr = jnp.arange(N, dtype=jnp.int32)
    child_tab = jnp.asarray(tpl.child_table)
    anc = jnp.asarray(tpl.anc)
    T = t_kv.max_seq

    wor = sample == "wor"
    V = t_llm.vocab_size
    if wor:
        assert temp is not None and top_k is not None and top_p is not None
        from ..sampling.sampler import (
            categorical_from_dist,
            sample_dist_batched,
        )

    # window verify on the TARGET cache (chain.py / eagle.py scheme,
    # tree-shaped): verify nodes land in carried window lanes;
    # acceptance marks path nodes valid at lane_pos = c + depth(node)
    # — their compacted position — replacing the rollback +
    # commit_tokens gather; ONE post-scan scatter commits.
    from ..engine import loops as _loops

    use_window = (_loops._DECODE_LOOP_DEFAULT == "window"
                  and _loops.window_eligible(t_kv, tparams)
                  and n_steps * N <= 1024)
    W_win = n_steps * N
    # DRAFT-side window (r5, closing the last carried cache): level
    # forwards used vis_override (committed prefix + own ancestors in
    # the CACHE); windowed, the cache stays loop-invariant (its mask IS
    # the committed-prefix visibility) and the tree structure moves
    # into PER-QUERY window-lane visibility ([S, Tq, W] inflight
    # validity, models/llama.py): a level-d query sees prior steps'
    # ACCEPTED lanes (the shared `valid`) plus its own ancestors among
    # this step's already-written level lanes. Node n's lane carries
    # rope position c + depth(n) — exactly its compacted commit
    # position — so the draft commit REUSES the target's lane_pos/valid
    # and ONE post-scan scatter replaces every rollback+commit_tokens.
    import os as _os

    d_window = (use_window and _loops.window_eligible(d_kv, dparams)
                and _os.environ.get("POWERSERVE_TREE_DRAFT_WINDOW",
                                    "1") != "0")
    if d_window:
        # written_mask[d][n]: node n's lane exists when level d drafts
        _written = []
        acc_nodes: list[int] = []
        for d in range(D + 1):
            w = np.zeros(N, bool)
            w[acc_nodes] = True
            _written.append(w)
            acc_nodes.extend(tpl.levels[d])
        d_kv_inv = d_kv  # loop-invariant buffers (closure, not carry)

    def _on_path(chain_m):
        idx = jnp.maximum(chain_m, 0)
        upd = chain_m >= 0
        return jax.vmap(
            lambda i_, u: jnp.zeros((N,), bool).at[i_].max(u))(idx, upd)

    def spec_step(carry, i):
        if use_window:
            (t_pos, wins, valid, lane_pos), d_st, root, rngs = carry
            base = i * N
            if d_window:
                d_wins, d_kv = d_st, d_kv_inv
            else:
                d_kv = d_st
            c = t_pos.astype(jnp.int32)
        else:
            t_kv_c, d_kv, root, rngs = carry
            c = d_kv.pos.astype(jnp.int32)  # [S] committed length
        mask0 = d_kv.mask  # committed visibility BEFORE this tree

        if wor:
            split = jax.vmap(lambda r: jax.random.split(r, 3 * D + 2))(rngs)
            wor_rngs = split[:, 0]
            g_keys = split[:, 1:1 + D]  # per-level Gumbel draws
            u_keys = split[:, 1 + D:1 + 2 * D]  # per-depth accept coins
            r_keys = split[:, 1 + 2 * D:]  # D + 1 residual samples
            q_dists = jnp.zeros((S, N, V), jnp.float32)

        tokens = jnp.zeros((S, N), jnp.int32).at[:, 0].set(root)
        # -- draft every level (the deepest only to write its KV) ------
        for d in range(D + 1):
            lev = tpl.levels[d]
            toks_l = tokens[:, lev]
            rope = jnp.where(active[:, None],
                             c[:, None] + depths[lev][None, :], -1)
            cpos = jnp.where(active[:, None],
                             c[:, None] + jnp.asarray(lev)[None, :], -1)
            if d_window:
                ln = len(lev)
                # prior steps' accepted lanes visible to every query;
                # this step's lanes per static ancestor/written masks
                prev_vis = jnp.broadcast_to(valid[:, None, :],
                                            (S, ln, W_win))
                step_vis = jnp.asarray(tpl.anc[lev] & _written[d][None, :])
                step_vis = (jnp.broadcast_to(step_vis[None], (S, ln, N))
                            & active[:, None, None])
                win_vis = jax.lax.dynamic_update_slice(
                    prev_vis, step_vis, (0, 0, base))
                logits, _, blk = forward(
                    dparams, d_llm, d_kv, toks_l, rope,
                    cache_positions=cpos,
                    intra_mask=jnp.eye(ln, dtype=bool), active=active,
                    backend=backend,
                    logits_mode="all" if d < D else "none",
                    tp_axis=tp_axis,
                    kv_update="window", inflight=d_wins + (win_vis,))
                d_wins = _loops.push_kv_window(d_wins, blk,
                                               base + lev[0])
            else:
                vis = _level_visibility(mask0, tpl.anc[lev], c, T)
                logits, d_kv = forward(
                    dparams, d_llm, d_kv, toks_l, rope,
                    cache_positions=cpos, vis_override=vis,
                    active=active, backend=backend,
                    logits_mode="all" if d < D else "none",
                    tp_axis=tp_axis)
            if d < D and wor:
                # children = WOR samples from the draft's post-transform
                # dist q: Gumbel top-k == sequential without-replacement
                # draws in rank order, exactly what the verification's
                # q-zeroing assumes
                w = tpl.level_topk[d]
                ln = len(lev)
                repl = lambda a: jnp.repeat(a, ln, axis=0)  # noqa: E731
                q_rows = sample_dist_batched(
                    logits.reshape(S * ln, -1)[:, :V], repl(temp),
                    repl(top_k), repl(top_p),
                    vocab_size=V).reshape(S, ln, V)
                q_dists = q_dists.at[:, lev].set(q_rows)
                g = jax.vmap(lambda r: jax.random.gumbel(r, (ln, V)))(
                    g_keys[:, d])
                scores = jnp.where(q_rows > 0, jnp.log(q_rows) + g,
                                   -jnp.inf)
                _, top_ids = jax.lax.top_k(scores, w)
                for row, child, r in tpl.assignments[d]:
                    tokens = tokens.at[:, child].set(
                        top_ids[:, row, r].astype(jnp.int32))
            elif d < D:
                w = tpl.level_topk[d]
                _, top_ids = jax.lax.top_k(
                    logits[:, :, :d_llm.vocab_size], w)  # [S, len(lev), w]
                for row, child, r in tpl.assignments[d]:
                    tokens = tokens.at[:, child].set(
                        top_ids[:, row, r].astype(jnp.int32))

        # -- one target verify over the whole tree ---------------------
        rope_v = jnp.where(active[:, None], c[:, None] + depths[None, :], -1)
        cpos_v = jnp.where(active[:, None], c[:, None] + idx_arr[None, :], -1)
        if use_window:
            kvi = dataclasses.replace(t_kv, pos=t_pos)
            logits, _, blk = forward(
                tparams, t_llm, kvi, tokens, rope_v,
                cache_positions=cpos_v, intra_mask=anc, active=active,
                backend=backend, logits_mode="all", tp_axis=tp_axis,
                kv_update="window", inflight=wins + (valid,))
            wins = _loops.push_kv_window(wins, blk, base)
        else:
            logits, t_kv_c = forward(
                tparams, t_llm, t_kv_c, tokens, rope_v,
                cache_positions=cpos_v, intra_mask=anc, active=active,
                backend=backend, logits_mode="all",
                tp_axis=tp_axis)  # [S, N, V]
        if wor:
            # -- recursive rejection over each node's rank-ordered WOR
            # candidates; the walk carries the evolving residual p_t ---
            repn = lambda a: jnp.repeat(a, N, axis=0)  # noqa: E731
            p_dists = sample_dist_batched(
                logits.reshape(S * N, -1)[:, :V], repn(temp), repn(top_k),
                repn(top_p), vocab_size=V).reshape(S, N, V)
            chain_m, n_acc, final_tok = _wor_accept_walk(
                tokens, q_dists, p_dists, tpl, child_tab, active,
                u_keys, r_keys, root)
            emit, new_root = _wor_emit(tokens, chain_m, n_acc, final_tok,
                                       active, root)

            if not d_window:
                d_kv = d_kv.rollback(d_kv.pos.astype(jnp.int32) - c,
                                     active=active)
            src = jnp.where(chain_m >= 0, c[:, None] + chain_m, -1)
            n_commit = jnp.where(active, n_acc + 1, 0)
            if not d_window:
                d_kv = d_kv.commit_tokens(jnp.arange(S), src, n_commit)
            if use_window:
                valid = jax.lax.dynamic_update_slice(
                    valid, _on_path(chain_m) & active[:, None], (0, base))
                lane_pos = jax.lax.dynamic_update_slice(
                    lane_pos,
                    jnp.where(active[:, None],
                              c[:, None] + depths[None, :], -1), (0, base))
                t_pos = jnp.where(active, c + n_acc + 1,
                                  c).astype(t_kv.pos.dtype)
                d_st = d_wins if d_window else d_kv
                return (((t_pos, wins, valid, lane_pos), d_st, new_root,
                         wor_rngs), (emit, n_commit))
            t_kv_c = t_kv_c.rollback(t_kv_c.pos.astype(jnp.int32) - c,
                                     active=active)
            t_kv_c = t_kv_c.commit_tokens(jnp.arange(S), src, n_commit)
            return (t_kv_c, d_kv, new_root, wor_rngs), (emit, n_commit)
        if sample:
            from ..sampling.sampler import sample_logits_batched

            split = jax.vmap(lambda r: jax.random.split(r, N + 1))(rngs)
            new_rngs = split[:, 0]
            keys = split[:, 1:].reshape(S * N, 2)
            rep = lambda a: jnp.repeat(a, N, axis=0)  # noqa: E731
            sampled = sample_logits_batched(
                keys[0], logits.reshape(S * N, -1)[:, :t_llm.vocab_size],
                rep(temp), rep(top_k), rep(top_p),
                vocab_size=t_llm.vocab_size, keys=keys,
            ).astype(jnp.int32).reshape(S, N)
        else:
            new_rngs = rngs
            sampled = jnp.argmax(logits[:, :, :t_llm.vocab_size],
                                 axis=-1).astype(jnp.int32)

        # -- vectorized acceptance walk over the static child table ----
        cur = jnp.zeros(S, jnp.int32)
        alive = jnp.ones(S, bool)
        chain = [cur]
        for _ in range(D):
            cand = child_tab[cur]  # [S, Cmax]
            cand_tok = jnp.take_along_axis(tokens, jnp.maximum(cand, 0),
                                           axis=1)
            tgt = jnp.take_along_axis(sampled, cur[:, None], axis=1)
            m = (cand >= 0) & (cand_tok == tgt) & alive[:, None]
            has = m.any(axis=1)
            pick = jnp.argmax(m, axis=1)  # lowest rank on ties
            child = jnp.take_along_axis(cand, pick[:, None], axis=1)[:, 0]
            cur = jnp.where(has, child, cur)
            alive = alive & has
            chain.append(jnp.where(has, child, -1))
        chain_m = jnp.stack(chain, axis=1)  # [S, D+1]
        n_acc = jnp.sum(chain_m[:, 1:] >= 0, axis=1)  # accepted drafts

        emit = jnp.take_along_axis(sampled, jnp.maximum(chain_m, 0), axis=1)
        emit = jnp.where(chain_m >= 0, emit, -1)  # [S, D+1]
        new_root = jnp.where(active,
                             jnp.take_along_axis(
                                 sampled, cur[:, None], axis=1)[:, 0],
                             root)

        # -- roll back to the committed prefix, compact accepted chain -
        # (d_window: lanes not marked valid simply never commit — no
        # rollback or gather-compaction needed on the draft side)
        if not d_window:
            d_kv = d_kv.rollback(d_kv.pos.astype(jnp.int32) - c,
                                 active=active)
        src = jnp.where(chain_m >= 0, c[:, None] + chain_m, -1)
        n_commit = jnp.where(active, n_acc + 1, 0)
        if not d_window:
            d_kv = d_kv.commit_tokens(jnp.arange(S), src, n_commit)
        counts = n_commit
        if use_window:
            valid = jax.lax.dynamic_update_slice(
                valid, _on_path(chain_m) & active[:, None], (0, base))
            lane_pos = jax.lax.dynamic_update_slice(
                lane_pos,
                jnp.where(active[:, None],
                          c[:, None] + depths[None, :], -1), (0, base))
            t_pos = jnp.where(active, c + n_acc + 1,
                              c).astype(t_kv.pos.dtype)
            d_st = d_wins if d_window else d_kv
            return (((t_pos, wins, valid, lane_pos), d_st, new_root,
                     new_rngs), (emit, counts))
        t_kv_c = t_kv_c.rollback(t_kv_c.pos.astype(jnp.int32) - c,
                                 active=active)
        t_kv_c = t_kv_c.commit_tokens(jnp.arange(S), src, n_commit)
        return (t_kv_c, d_kv, new_root, new_rngs), (emit, counts)

    if use_window:
        wins0 = _loops.make_kv_window(t_kv, t_llm, S, W_win)
        st0 = (t_kv.pos, wins0, jnp.zeros((S, W_win), bool),
               jnp.full((S, W_win), -1, jnp.int32))
        d_st0 = (_loops.make_kv_window(d_kv, d_llm, S, W_win)
                 if d_window else d_kv)
        ((t_pos, wins, valid, lane_pos), d_st, root, rngs), \
            (emitted, counts) = jax.lax.scan(
                spec_step, (st0, d_st0, root, rngs), jnp.arange(n_steps))
        t_kv = _loops.commit_kv_lanes(t_kv, wins, lane_pos, valid,
                                      t_pos, t_kv.mask)
        if d_window:
            # node n's lane rope position == its compacted commit
            # position, so the draft shares the target's lane_pos/valid
            d_kv = _loops.commit_kv_lanes(d_kv, d_st, lane_pos, valid,
                                          t_pos, d_kv.mask)
        else:
            d_kv = d_st
    else:
        (t_kv, d_kv, root, rngs), (emitted, counts) = jax.lax.scan(
            spec_step, (t_kv, d_kv, root, rngs), jnp.arange(n_steps))
    return emitted, counts, t_kv, d_kv, root, rngs


class DeviceTreeEngine:
    """Host wrapper (single stream): prefill both models, then emit
    tokens in blocks of on-device tree steps — the tree analogue of
    chain.ChainSpecEngine, same block dispatch model."""

    def __init__(self, target_params: LlamaParams, target_cfg: ModelConfig,
                 draft_params: LlamaParams | None = None,
                 draft_cfg: ModelConfig | None = None,
                 self_draft_layers: int = 0,
                 template: TreeTemplate | None = None,
                 block_steps: int = 8, max_seq: int = 0,
                 kv_dtype: str = "int8", backend: str = "auto"):
        from .chain import self_draft_config

        self.tp, self.tcfg = target_params, target_cfg
        if self_draft_layers:
            self.dp = target_params
            self.d_llm = self_draft_config(target_cfg.llm, self_draft_layers)
        else:
            assert draft_params is not None and draft_cfg is not None
            self.dp, self.d_llm = draft_params, draft_cfg.llm
        self.t_llm = target_cfg.llm
        self.template = template or TreeTemplate.from_widths([2, 1, 1])
        self.block_steps = block_steps
        self.backend = backend
        self.max_seq = max_seq or target_cfg.llm.seq_len
        self.kv_dtype = kv_dtype
        self.reset()

    def reset(self) -> None:
        t, d = self.t_llm, self.d_llm
        self.t_kv = KVCache.create(t.n_layers, 1, self.max_seq,
                                   t.n_kv_heads, t.head_size, self.kv_dtype)
        self.d_kv = KVCache.create(d.n_layers, 1, self.max_seq,
                                   d.n_kv_heads, d.head_size, self.kv_dtype)

    def prefill(self, prompt_tokens: list[int], chunk: int = 128) -> None:
        from ..engine.loops import prefill_step

        toks = np.asarray(prompt_tokens[:-1], np.int32)
        for off in range(0, len(toks), chunk):
            part = toks[off:off + chunk]
            pos = off + np.arange(len(part), dtype=np.int32)
            t = jnp.asarray(part[None, :])
            p = jnp.asarray(pos[None, :])
            _, self.t_kv = prefill_step(self.tp, t, p, self.t_kv,
                                        self.t_llm, self.backend)
            _, self.d_kv = prefill_step(self.dp, t, p, self.d_kv,
                                        self.d_llm, self.backend)
        self._root = jnp.asarray([prompt_tokens[-1]], jnp.int32)

    def generate(self, prompt_tokens: list[int], n_predict: int,
                 stop_fn=None, stats: SpecStats | None = None):
        stats = stats if stats is not None else SpecStats()
        tpl = self.template
        self.prefill(prompt_tokens)
        out = 0
        while out < n_predict:
            room = self.max_seq - int(np.asarray(self.t_kv.pos)[0])
            if room < self.block_steps * (tpl.max_depth + 1) + tpl.n_nodes:
                return
            emitted, counts, self.t_kv, self.d_kv, self._root, _ = \
                tree_spec_scan(self.tp, self.dp, self.t_kv, self.d_kv,
                               self._root, self.t_llm, self.d_llm,
                               self.block_steps, tpl.key(), self.backend)
            emitted = np.asarray(emitted)  # [steps, 1, D+1]
            counts = np.asarray(counts)
            for i in range(self.block_steps):
                stats.steps += 1
                stats.drafted += tpl.n_nodes - 1
                stats.accepted += int(counts[i, 0]) - 1
                for t in emitted[i, 0, :counts[i, 0]]:
                    stats.emitted += 1
                    out += 1
                    yield int(t)
                    if (stop_fn is not None and stop_fn(int(t))) \
                            or out >= n_predict:
                        return
