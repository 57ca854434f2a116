"""Explicit tensor-parallel forward via shard_map (Pallas-capable).

The GSPMD path (parallel/mesh.py) lets XLA partition the jitted forward
— but Pallas calls are opaque to GSPMD, so the fused dequant-matmul
kernel forces a full-replication fallback on a mesh. This module is the
multichip path that keeps the kernel: the WHOLE forward runs inside a
jax.shard_map over a (dp, tp) mesh, each device executes the Pallas
kernel on its local weight shard, and the megatron collectives are
explicit (models/llama.py forward(tp_axis=...)):

  - wq/wk/wv (or fused wqkv), ffn gate/up (or fused wgu): column-
    parallel — heads / ffn columns split over "tp", no collective
  - wo, ffn down: row-parallel — psum over "tp" after the matmul
  - embedding: vocab-sharded masked gather + psum
  - lm_head: vocab-sharded matmul + all-gather
  - KV cache: kv heads over "tp", slots over "dp"

Two collectives per layer ([S*Tq, dim] psums over ICI), one psum + one
all-gather at the ends — the standard megatron schedule ("How to Scale
Your Model" recipe), replacing the reference's single-device NPU
execution (SURVEY §2.3: scale-out is net-new design space).

Fused projections need a host-side column permutation first
(prepare_params_for_tp): the fused wqkv concat [q|k|v] must become
[q_0|k_0|v_0 | q_1|k_1|v_1 | ...] so an equal contiguous split hands
each shard its own heads in local concat order. Row-parallel packed
weights are repacked so the nibble pack group divides the LOCAL K.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LLMConfig
from ..core.quant import QK, choose_pack_group
from ..kv.cache import KVCache
from ..models.llama import LayerWeights, LlamaParams, QEmbedding, forward
from ..ops.qmatmul import QLinear


# ---------------------------------------------------------------------------
# host-side parameter re-layout
# ---------------------------------------------------------------------------

def _jnp_unpack_nib(p: jax.Array, group: int) -> jax.Array:
    """uint8 [.., K/2, N] -> raw nibble values uint8 [.., K, N]."""
    half = group // 2
    lead, (kh, n) = p.shape[:-2], p.shape[-2:]
    pg = p.reshape(*lead, kh // half, half, n)
    lo = pg & 0xF
    hi = pg >> 4
    return jnp.concatenate([lo, hi], axis=-2).reshape(*lead, kh * 2, n)


def _jnp_pack_nib(u: jax.Array, group: int) -> jax.Array:
    """Inverse: raw nibbles uint8 [.., K, N] -> packed [.., K/2, N]."""
    half = group // 2
    lead, (k, n) = u.shape[:-2], u.shape[-2:]
    ug = u.reshape(*lead, k // group, group, n)
    return (ug[..., :half, :] | (ug[..., half:, :] << 4)).reshape(
        *lead, k // 2, n)


def _permute_cols(lin: QLinear | None, perm: np.ndarray) -> QLinear | None:
    if lin is None:
        return None
    take = functools.partial(jnp.take, indices=jnp.asarray(perm), axis=-1)
    return dataclasses.replace(
        lin, q=take(lin.q), scales=take(lin.scales),
        bias=None if lin.bias is None else take(lin.bias))


def _qkv_perm(H: int, Hkv: int, D: int, tp: int) -> np.ndarray:
    """Column order so shard s holds [q_s | k_s | v_s] contiguously."""
    q_off, k_off, v_off = 0, H * D, (H + Hkv) * D
    hq, hkv = H // tp * D, Hkv // tp * D
    parts = []
    for s in range(tp):
        parts.append(np.arange(q_off + s * hq, q_off + (s + 1) * hq))
        parts.append(np.arange(k_off + s * hkv, k_off + (s + 1) * hkv))
        parts.append(np.arange(v_off + s * hkv, v_off + (s + 1) * hkv))
    return np.concatenate(parts)


def _gu_perm(F: int, tp: int) -> np.ndarray:
    """Column order so shard s holds [gate_s | up_s] contiguously."""
    f = F // tp
    parts = []
    for s in range(tp):
        parts.append(np.arange(s * f, (s + 1) * f))
        parts.append(np.arange(F + s * f, F + (s + 1) * f))
    return np.concatenate(parts)


def _repack_rows(lin: QLinear | None, tp: int) -> QLinear | None:
    """Make a row-parallel QLinear splittable into tp K-shards: the
    nibble pack group (and the 32-wide scale blocks) must divide the
    local K. Runs as jnp ops so device arrays never round-trip the
    host."""
    if lin is None:
        return None
    k = lin.in_features
    if k % tp or (k // tp) % QK:
        raise ValueError(f"K={k} not row-shardable over tp={tp}")
    if not lin.packed or (k // tp) % lin.pack_group == 0:
        return lin
    new_group = choose_pack_group(k // tp)
    raw = _jnp_unpack_nib(lin.q, lin.pack_group)
    return dataclasses.replace(lin, q=_jnp_pack_nib(raw, new_group),
                               pack_group=new_group)


def prepare_params_for_tp(params: LlamaParams, cfg: LLMConfig,
                          tp: int) -> LlamaParams:
    """Host-side re-layout before sharding (call once at load time):
    permute fused wqkv/wgu columns per-shard, repack row-parallel
    weights to a local-K-aligned pack group. No-op when tp == 1."""
    if tp == 1:
        return params
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_size
    if H % tp or Hkv % tp:
        raise ValueError(f"heads {H}/{Hkv} not divisible by tp={tp}")

    fix_layer = functools.partial(_fix_layer_for_tp, H=H, Hkv=Hkv, D=D,
                                  tp=tp)
    if isinstance(params.layers, (tuple, list)):
        layers = tuple(fix_layer(lw) for lw in params.layers)
    else:
        layers = fix_layer(params.layers)
    return dataclasses.replace(params, layers=layers)


def _fix_layer_for_tp(lw: LayerWeights, H: int, Hkv: int, D: int,
                      tp: int) -> LayerWeights:
    """Per-layer host re-layout (shared by target and EAGLE-head prep):
    permute fused wqkv/wgu columns per-shard, repack row-parallel
    weights to a local-K-aligned pack group."""
    out = lw
    if lw.wqkv is not None:
        perm = _qkv_perm(H, Hkv, D, tp)
        out = dataclasses.replace(
            out, wqkv=_permute_cols(lw.wqkv, perm),
            bqkv=None if lw.bqkv is None
            else jnp.take(lw.bqkv, jnp.asarray(perm), axis=-1))
    if lw.wgu is not None:
        F = lw.wgu.out_features // 2
        out = dataclasses.replace(
            out, wgu=_permute_cols(lw.wgu, _gu_perm(F, tp)))
    return dataclasses.replace(
        out, wo=_repack_rows(out.wo, tp),
        w_down=_repack_rows(out.w_down, tp),
        w_down_exps=_repack_rows(out.w_down_exps, tp))


# ---------------------------------------------------------------------------
# partition specs
# ---------------------------------------------------------------------------

def _divisible(n: int, by: int) -> bool:
    return n % by == 0


def _layer_specs(lw: LayerWeights, lead: tuple) -> LayerWeights:
    """PartitionSpecs for one decoder layer (each QLinear subtree gets
    one spec — q/scales/bias all shard the same axis). Shared by the
    target's param_specs and the EAGLE head's eagle_param_specs."""
    col = P(*lead, None, "tp")
    row = P(*lead, "tp", None)
    repl = P()

    def colspec(l):
        return None if l is None else col

    def rowspec(l):
        return None if l is None else row

    def bias(b):
        return None if b is None else P(*lead, "tp")

    # expert leaves carry (layer?, expert, K, N): experts shard
    # over "ep", and their matmul dims over "tp" like the dense FFN
    ecol = P(*lead, "ep", None, "tp")
    erow = P(*lead, "ep", "tp", None)
    return LayerWeights(
        attn_norm=repl, ffn_norm=repl,
        wq=colspec(lw.wq), wk=colspec(lw.wk), wv=colspec(lw.wv),
        wo=rowspec(lw.wo),
        bq=bias(lw.bq), bk=bias(lw.bk), bv=bias(lw.bv),
        w_gate=colspec(lw.w_gate), w_up=colspec(lw.w_up),
        w_down=rowspec(lw.w_down),
        wqkv=colspec(lw.wqkv), bqkv=bias(lw.bqkv),
        wgu=colspec(lw.wgu),
        # QK-norm weights are per-head [hd]: replicated
        q_norm=None if lw.q_norm is None else repl,
        k_norm=None if lw.k_norm is None else repl,
        router=None if lw.router is None else repl,
        w_gate_exps=None if lw.w_gate_exps is None else ecol,
        w_up_exps=None if lw.w_up_exps is None else ecol,
        w_down_exps=None if lw.w_down_exps is None else erow,
    )


def param_specs(params: LlamaParams, tp: int) -> LlamaParams:
    """PartitionSpec pytree matching params (each QLinear subtree gets
    one spec — q/scales/bias all shard the same axis)."""
    stacked = not isinstance(params.layers, (tuple, list))
    lead = (None,) if stacked else ()
    repl = P()
    spec_layer = functools.partial(_layer_specs, lead=lead)

    if stacked:
        layers = spec_layer(params.layers)
    else:
        layers = tuple(spec_layer(lw) for lw in params.layers)

    vocab = params.embed.q.shape[0]
    espec = P("tp", None) if _divisible(vocab, tp) else P()
    hspec = P(None, "tp") if _divisible(params.lm_head.out_features,
                                        tp) else P()
    return LlamaParams(
        embed=QEmbedding(q=espec, scales=espec,
                         bias=None if params.embed.bias is None else espec),
        layers=layers, out_norm=repl,
        lm_head=hspec,
        # factored draft head (draft models only): small — replicate
        lm_head_lr=None if params.lm_head_lr is None else P(),
    )


def kv_specs(kv: KVCache) -> KVCache:
    """[L, S, H, T, D]: kv heads over tp, slots over dp, cache time
    over sp (a no-op when the mesh's sp axis is 1).

    Paged pools ([L, P, H, page, D], kv/paged.py) shard kv heads over
    "tp" and the POOL-PAGE axis over "dp": the host allocator
    (PagePool n_groups=dp) confines each dp group's slots to its own
    page partition, so every shard scatters exclusively into its local
    slab shard. The page table / mask / pos shard their slot axis over
    dp; table values stay GLOBAL page ids — _remap_paged_dp translates
    them to shard-local ids inside the shard_map body. sp must be 1."""
    from ..kv.paged import PagedKVCache

    if isinstance(kv, PagedKVCache):
        import dataclasses

        return dataclasses.replace(
            kv, k=P(None, "dp", "tp", None, None),
            v=P(None, "dp", "tp", None, None),
            k_scale=P(None, "dp", "tp", None),
            v_scale=P(None, "dp", "tp", None),
            page_table=P("dp", None), mask=P("dp", None), pos=P("dp"))
    kvs = P(None, "dp", "tp", "sp", None)
    scs = P(None, "dp", "tp", "sp") if kv.quantized else P()
    return KVCache(k=kvs, v=kvs, k_scale=scs, v_scale=scs,
                   mask=P("dp", "sp"), pos=P("dp"), quantized=kv.quantized)


def _remap_paged_dp(kv):
    """Inside a shard_map body: translate a dp-sharded paged pool's
    page table from GLOBAL page ids to shard-local ids (shard g owns
    pages [g*PL, (g+1)*PL) of the global pool; ids outside the local
    range — including the global unallocated sentinel — map to the
    LOCAL sentinel PL, which locate() drops). Returns (kv with local
    table, original table) — callers must restore the original table
    on the OUTPUT kv so the global array never holds local ids.
    No-op (returns (kv, None)) for dense caches."""
    from ..kv.paged import PagedKVCache

    if not isinstance(kv, PagedKVCache):
        return kv, None
    pt = kv.page_table
    pl = kv.k.shape[1]  # local pages on this shard
    lo = jax.lax.axis_index("dp") * pl
    local = jnp.where((pt >= lo) & (pt < lo + pl), pt - lo, pl)
    return dataclasses.replace(kv, page_table=local), pt


def _restore_paged_dp(kv, orig_pt):
    if orig_pt is None:
        return kv
    return dataclasses.replace(kv, page_table=orig_pt)


# ---------------------------------------------------------------------------
# shard_map forward
# ---------------------------------------------------------------------------

def _localize_qlinear(lin: QLinear | None) -> QLinear | None:
    """Inside the shard_map body, array leaves are local shards but the
    static meta still holds global sizes — rebuild them from shapes."""
    if lin is None:
        return None
    k = lin.q.shape[-2] * (2 if lin.packed else 1)
    return dataclasses.replace(lin, in_features=k,
                               out_features=lin.q.shape[-1])


def _localize_layer(lw: LayerWeights) -> LayerWeights:
    return dataclasses.replace(
        lw,
        wq=_localize_qlinear(lw.wq), wk=_localize_qlinear(lw.wk),
        wv=_localize_qlinear(lw.wv), wo=_localize_qlinear(lw.wo),
        w_gate=_localize_qlinear(lw.w_gate),
        w_up=_localize_qlinear(lw.w_up),
        w_down=_localize_qlinear(lw.w_down),
        wqkv=_localize_qlinear(lw.wqkv),
        wgu=_localize_qlinear(lw.wgu),
        w_gate_exps=_localize_qlinear(lw.w_gate_exps),
        w_up_exps=_localize_qlinear(lw.w_up_exps),
        w_down_exps=_localize_qlinear(lw.w_down_exps),
    )


def _localize_params(params: LlamaParams) -> LlamaParams:
    fix_layer = _localize_layer

    if isinstance(params.layers, (tuple, list)):
        layers = tuple(fix_layer(lw) for lw in params.layers)
    else:
        layers = fix_layer(params.layers)
    lr = params.lm_head_lr
    if lr is not None:  # replicated factored draft head
        lr = tuple(_localize_qlinear(f) for f in lr)
    return dataclasses.replace(
        params, layers=layers, lm_head=_localize_qlinear(params.lm_head),
        lm_head_lr=lr)


def local_llm_config(llm: LLMConfig, tp: int) -> LLMConfig:
    """Per-shard head counts (vocab/dim stay global: the residual is
    replicated and vocab sharding is detected from array shapes)."""
    if tp == 1:
        return llm
    if llm.n_heads % tp or llm.n_kv_heads % tp:
        raise ValueError(f"heads not divisible by tp={tp}")
    return dataclasses.replace(
        llm, n_heads=llm.n_heads // tp, n_kv_heads=llm.n_kv_heads // tp,
        kv_dim=llm.n_kv_heads // tp * llm.head_size)


def _put_by_specs(tree, specs, mesh: Mesh):
    """device_put a pytree by a PREFIX tree of PartitionSpecs (a P leaf
    at an interior position applies to that whole subtree)."""
    is_leaf = lambda x: x is None or isinstance(x, P)  # noqa: E731
    spec_leaves, treedef = jax.tree_util.tree_flatten(specs, is_leaf=is_leaf)
    subtrees = treedef.flatten_up_to(tree)

    def put(spec, sub):
        if sub is None:
            return None
        return jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, spec)), sub)

    return jax.tree_util.tree_unflatten(
        treedef, [put(s, t) for s, t in zip(spec_leaves, subtrees)])


def shard_params_tp(params: LlamaParams, mesh: Mesh,
                    cfg: LLMConfig) -> LlamaParams:
    """prepare + device_put with the tp shardings (load-time helper)."""
    tp = mesh.shape["tp"]
    params = prepare_params_for_tp(params, cfg, tp)
    return _put_by_specs(params, param_specs(params, tp), mesh)


def shard_kv_tp(kv: KVCache, mesh: Mesh) -> KVCache:
    return _put_by_specs(kv, kv_specs(kv), mesh)


def window_specs() -> tuple:
    """PartitionSpecs for the in-flight decode window
    (engine/loops.py::make_kv_window layout [L, S, Hkv, W(, D)]): kv
    heads shard over "tp", slots over "dp" — matching kv_specs so the
    window is just more cache from each shard's point of view."""
    w = P(None, "dp", "tp", None, None)
    s = P(None, "dp", "tp", None)
    return (w, w, s, s)


def tp_forward(params: LlamaParams, llm: LLMConfig, kv: KVCache,
               tokens: jax.Array, positions: jax.Array, *,
               mesh: Mesh, active: jax.Array | None = None,
               backend: str = "auto", logits_mode: str = "last",
               embeds: jax.Array | None = None,
               use_embeds: jax.Array | None = None,
               kv_update: str | None = None,
               inflight: tuple | None = None):
    """Sharded forward: logits [S, vocab] (S over dp), updated kv.

    params/kv must already be laid out by shard_params_tp/shard_kv_tp
    (or carry equivalent NamedShardings). Works under jit and inside
    lax.scan — shard_map stages into the surrounding trace.

    embeds [S, Tq, dim] + use_embeds [S] bool: per-slot embedding
    overlay (VLM prefill — slots flagged in use_embeds take their input
    rows from `embeds` instead of the token embedding table; the
    scheduler's multimodal tick, engine/scheduler.py).

    kv_update="window" + inflight (window tuple + filled indicator, see
    models/llama.py forward): the tp tick of the WINDOW decode loop —
    the big cache shards stay loop-invariant, each shard's new K/V
    block comes back as a third output for the caller's window push,
    and the caller commits once post-loop (the L=32 carried-scatter
    cliff applies per shard exactly like on one chip). The window
    shards like the cache (heads over tp, slots over dp)."""
    tp = mesh.shape["tp"]
    sp = mesh.shape.get("sp", 1)
    ep = mesh.shape.get("ep", 1)
    window = kv_update == "window"
    assert not window or inflight is not None, \
        "tp window ticks need inflight"
    llm_local = local_llm_config(llm, tp)
    pspecs = param_specs(params, tp)
    kspecs = kv_specs(kv)
    tok_spec = P("dp", None)
    act_spec = None if active is None else P("dp")
    emb_spec = None if embeds is None else P("dp", None, None)
    use_spec = None if use_embeds is None else P("dp")
    sp_axis = "sp" if sp > 1 else None
    ep_axis = "ep" if ep > 1 else None
    if window:
        filled = inflight[4]
        # filled: scalar lane count (decode loop) replicates; [S, W]
        # bool lane validity (spec scans) shards slots over dp
        fill_spec = P("dp", None) if getattr(filled, "ndim", 0) == 2 \
            else P()
        win_specs = window_specs() + (fill_spec,)

    def body(params, kv, tokens, positions, active, embeds, use_embeds,
             inflight):
        params = _localize_params(params)
        x = None
        if embeds is not None:
            # overlay AFTER the (possibly vocab-sharded) table lookup:
            # run forward once just for its embedding path semantics by
            # computing the table rows here with the same tp logic
            if params.embed.q.shape[0] < llm_local.vocab_size:
                v_local = params.embed.q.shape[0]
                off = jax.lax.axis_index("tp") * v_local
                local = tokens - off
                ok = (local >= 0) & (local < v_local)
                xg = params.embed.lookup(jnp.where(ok, local, 0))
                xg = jnp.where(ok[..., None], xg, 0.0)
                xt = jax.lax.psum(xg, "tp").astype(jnp.bfloat16)
            else:
                xt = params.embed.lookup(tokens).astype(jnp.bfloat16)
            x = jnp.where(use_embeds[:, None, None],
                          embeds.astype(jnp.bfloat16), xt)
        kv, _pt = _remap_paged_dp(kv)
        out = forward(params, llm_local, kv, tokens, positions,
                      active=active, backend=backend,
                      logits_mode=logits_mode, tp_axis="tp",
                      sp_axis=sp_axis, ep_axis=ep_axis, embeds=x,
                      kv_update=kv_update, inflight=inflight)
        if _pt is not None:
            out = (out[0], _restore_paged_dp(out[1], _pt)) + out[2:]
        return out

    out_specs = (P("dp", None), kspecs)
    if window:
        out_specs = out_specs + (window_specs(),)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, kspecs, tok_spec, tok_spec, act_spec,
                  emb_spec, use_spec, win_specs if window else None),
        out_specs=out_specs,
        check_vma=False)
    return f(params, kv, tokens, positions, active, embeds, use_embeds,
             inflight)


@functools.partial(jax.jit,
                   static_argnames=("llm", "n_steps", "backend", "mesh"),
                   donate_argnums=(2,))
def tp_decode_scan(params: LlamaParams, tokens: jax.Array, kv: KVCache,
                   llm: LLMConfig, n_steps: int, mesh: Mesh,
                   backend: str = "auto") -> tuple[jax.Array, KVCache]:
    """Greedy multi-step decode over the mesh (engine/loops.py
    decode_scan with the shard_map forward)."""

    def body(carry, _):
        tok, kv = carry
        pos = kv.pos.astype(jnp.int32)
        logits, kv = tp_forward(params, llm, kv, tok[:, None], pos[:, None],
                                mesh=mesh, backend=backend,
                                logits_mode="last")
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, kv), nxt

    (_, kv), toks = jax.lax.scan(body, (tokens, kv), None, length=n_steps)
    return toks.T, kv


@functools.partial(jax.jit, static_argnames=("llm", "backend", "mesh"),
                   donate_argnums=(3,))
def tp_prefill(params: LlamaParams, tokens: jax.Array,
               positions: jax.Array, kv: KVCache, llm: LLMConfig,
               mesh: Mesh, backend: str = "auto"):
    return tp_forward(params, llm, kv, tokens, positions, mesh=mesh,
                      backend=backend, logits_mode="last")


# ---------------------------------------------------------------------------
# shard_map speculation (spec x tp: the fused kernel stays in play)
# ---------------------------------------------------------------------------

def _spec_arg_specs(t_kv, d_kv):
    vec = P("dp")
    return dict(tkv=kv_specs(t_kv), dkv=kv_specs(d_kv), vec=vec,
                rng=P("dp", None))


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "d_llm", "n_steps", "k", "backend", "mesh"),
    donate_argnums=(2, 3),
)
def tp_chain_spec_scan(tparams: LlamaParams, dparams: LlamaParams,
                       t_kv: KVCache, d_kv: KVCache, root: jax.Array,
                       t_llm: LLMConfig, d_llm: LLMConfig,
                       n_steps: int, k: int, mesh: Mesh,
                       backend: str = "auto",
                       active: jax.Array | None = None,
                       rngs: jax.Array | None = None,
                       temp: jax.Array | None = None,
                       top_k: jax.Array | None = None,
                       top_p: jax.Array | None = None):
    """chain_spec_sample_scan inside ONE shard_map over the (dp, tp)
    mesh: the whole multi-step draft->verify->accept scan runs with
    LOCAL weight shards (Pallas kernels on-shard) and explicit megatron
    collectives — speculation composes with tensor-parallel serving
    without dropping to the GSPMD backend="xla" fallback. Sampling on
    the replicated logits is computed redundantly (and identically) per
    tp shard; slots shard over dp."""
    from ..speculative.chain import chain_spec_sample_scan

    tp = mesh.shape["tp"]
    assert mesh.shape.get("sp", 1) == 1, "spec x sp unsupported"
    t_local = local_llm_config(t_llm, tp)
    d_local = local_llm_config(d_llm, tp)
    sp = _spec_arg_specs(t_kv, d_kv)

    def body(tparams, dparams, t_kv, d_kv, root, active, rngs,
             temp, top_k, top_p):
        t_kv, _pt = _remap_paged_dp(t_kv)
        out = chain_spec_sample_scan(
            _localize_params(tparams), _localize_params(dparams),
            t_kv, d_kv, root, t_local, d_local, n_steps, k,
            backend=backend, active=active, rngs=rngs, temp=temp,
            top_k=top_k, top_p=top_p, tp_axis="tp")
        return out[:2] + (_restore_paged_dp(out[2], _pt),) + out[3:]

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(param_specs(tparams, tp), param_specs(dparams, tp),
                  sp["tkv"], sp["dkv"], sp["vec"], sp["vec"], sp["rng"],
                  sp["vec"], sp["vec"], sp["vec"]),
        out_specs=(P(None, "dp", None), P(None, "dp"), sp["tkv"],
                   sp["dkv"], sp["vec"], sp["rng"]),
        check_vma=False)
    return f(tparams, dparams, t_kv, d_kv, root, active, rngs,
             temp, top_k, top_p)


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "d_llm", "n_steps", "tree_key", "backend",
                     "mesh", "sample"),
    donate_argnums=(2, 3),
)
def tp_tree_spec_scan(tparams: LlamaParams, dparams: LlamaParams,
                      t_kv: KVCache, d_kv: KVCache, root: jax.Array,
                      t_llm: LLMConfig, d_llm: LLMConfig,
                      n_steps: int, tree_key: tuple, mesh: Mesh,
                      backend: str = "auto",
                      active: jax.Array | None = None,
                      rngs: jax.Array | None = None,
                      temp: jax.Array | None = None,
                      top_k: jax.Array | None = None,
                      top_p: jax.Array | None = None,
                      sample: bool = False):
    """tree_spec_scan inside one shard_map (see tp_chain_spec_scan)."""
    from ..speculative.device_tree import tree_spec_scan

    tp = mesh.shape["tp"]
    assert mesh.shape.get("sp", 1) == 1, "spec x sp unsupported"
    t_local = local_llm_config(t_llm, tp)
    d_local = local_llm_config(d_llm, tp)
    sp = _spec_arg_specs(t_kv, d_kv)

    def body(tparams, dparams, t_kv, d_kv, root, active, rngs,
             temp, top_k, top_p):
        t_kv, _pt = _remap_paged_dp(t_kv)
        out = tree_spec_scan(
            _localize_params(tparams), _localize_params(dparams),
            t_kv, d_kv, root, t_local, d_local, n_steps, tree_key,
            backend=backend, active=active, rngs=rngs, temp=temp,
            top_k=top_k, top_p=top_p, sample=sample, tp_axis="tp")
        return out[:2] + (_restore_paged_dp(out[2], _pt),) + out[3:]

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(param_specs(tparams, tp), param_specs(dparams, tp),
                  sp["tkv"], sp["dkv"], sp["vec"], sp["vec"], sp["rng"],
                  sp["vec"], sp["vec"], sp["vec"]),
        out_specs=(P(None, "dp", None), P(None, "dp"), sp["tkv"],
                   sp["dkv"], sp["vec"], sp["rng"]),
        check_vma=False)
    return f(tparams, dparams, t_kv, d_kv, root, active, rngs,
             temp, top_k, top_p)


# ---------------------------------------------------------------------------
# EAGLE over the shard_map mesh (spec x tp on the flagship serving path)
# ---------------------------------------------------------------------------
# The EAGLE head is a 1-layer llama decoder over target features
# (speculative/eagle.py). Under tp it shards exactly like a target
# layer — wqkv/wgu column-parallel (pre-permuted), wo/w_down
# row-parallel with psums — while the small fc fusion projection and
# the optional factored lm_head_lr replicate, and the (usually
# target-aliased) embed/lm_head tables keep the target's vocab
# sharding, so sharing stays zero-copy. Reference role: speculation is
# the reference's headline feature (README.md:4-7) and must ride the
# flagship multichip path.

def prepare_eagle_for_tp(ep, e_llm: LLMConfig, tp: int):
    """Host-side head re-layout before sharding (no-op at tp == 1)."""
    if tp == 1:
        return ep
    H, Hkv, D = e_llm.n_heads, e_llm.n_kv_heads, e_llm.head_size
    if H % tp or Hkv % tp:
        raise ValueError(f"eagle heads {H}/{Hkv} not divisible by tp={tp}")
    layers = tuple(_fix_layer_for_tp(lw, H, Hkv, D, tp)
                   for lw in ep.layers)
    return dataclasses.replace(ep, layers=layers)


def eagle_param_specs(ep, tp: int):
    """PartitionSpec pytree matching EagleParams."""
    from ..speculative.eagle import EagleParams

    layers = tuple(_layer_specs(lw, ()) for lw in ep.layers)
    vocab = ep.embed.q.shape[0]
    espec = P("tp", None) if _divisible(vocab, tp) else P()
    hspec = P(None, "tp") if _divisible(ep.lm_head.out_features,
                                        tp) else P()
    return EagleParams(
        fc=P(), fc_bias=None if ep.fc_bias is None else P(),
        layers=layers,
        embed=QEmbedding(q=espec, scales=espec,
                         bias=None if ep.embed.bias is None else espec),
        lm_head=hspec,
        out_norm=None if ep.out_norm is None else P(),
        input_norm=ep.input_norm,
        lm_head_lr=None if ep.lm_head_lr is None else P())


def shard_eagle_tp(ep, mesh: Mesh, e_llm: LLMConfig):
    """prepare + device_put with the tp shardings (load-time helper).
    embed/lm_head arrays aliased from an already-sharded target are
    re-put with the SAME sharding — a no-op, no duplication."""
    tp = mesh.shape["tp"]
    ep = prepare_eagle_for_tp(ep, e_llm, tp)
    return _put_by_specs(ep, eagle_param_specs(ep, tp), mesh)


def _localize_eagle(ep):
    lr = ep.lm_head_lr
    if lr is not None:
        lr = tuple(_localize_qlinear(f) for f in lr)
    return dataclasses.replace(
        ep, fc=_localize_qlinear(ep.fc),
        layers=tuple(_localize_layer(lw) for lw in ep.layers),
        lm_head=_localize_qlinear(ep.lm_head), lm_head_lr=lr)


def tp_eagle_prefill(params: LlamaParams, eparams, kv: KVCache,
                     e_kv: KVCache, tokens: jax.Array,
                     positions: jax.Array, active: jax.Array,
                     last_feat: jax.Array, n_real: jax.Array,
                     t_llm: LLMConfig, e_llm: LLMConfig, mesh: Mesh,
                     backend: str = "auto",
                     embeds: jax.Array | None = None,
                     use_embeds: jax.Array | None = None):
    """Target prefill chunk + head prefill inside ONE shard_map (the tp
    twin of the scheduler's eagle_prefill_chunk): returns (kv, e_kv,
    new carried feature [S, dim]). embeds/use_embeds: per-slot VLM
    overlay (mm x eagle x tp)."""
    from ..speculative.eagle import eagle_forward

    tp = mesh.shape["tp"]
    assert mesh.shape.get("sp", 1) == 1, "eagle x sp unsupported"
    t_local = local_llm_config(t_llm, tp)
    e_local = local_llm_config(e_llm, tp)
    tok_spec = P("dp", None)
    feat_spec = P("dp", None)
    emb_spec = None if embeds is None else P("dp", None, None)
    use_spec = None if use_embeds is None else P("dp")

    def body(params, eparams, kv, e_kv, tokens, positions, active,
             last_feat, n_real, embeds, use_embeds):
        params = _localize_params(params)
        eparams = _localize_eagle(eparams)
        x = None
        if embeds is not None:
            if params.embed.q.shape[0] < t_local.vocab_size:
                v_local = params.embed.q.shape[0]
                off = jax.lax.axis_index("tp") * v_local
                local = tokens - off
                ok = (local >= 0) & (local < v_local)
                xg = params.embed.lookup(jnp.where(ok, local, 0))
                xg = jnp.where(ok[..., None], xg, 0.0)
                xt = jax.lax.psum(xg, "tp").astype(jnp.bfloat16)
            else:
                xt = params.embed.lookup(tokens).astype(jnp.bfloat16)
            x = jnp.where(use_embeds[:, None, None],
                          embeds.astype(jnp.bfloat16), xt)
        kv, _pt = _remap_paged_dp(kv)
        _, kv, feats = forward(params, t_local, kv, tokens, positions,
                               active=active, backend=backend,
                               logits_mode="none", embeds=x,
                               return_final_hidden=True, tp_axis="tp")
        kv = _restore_paged_dp(kv, _pt)
        feats = feats.astype(jnp.float32)  # [S, C, dim]
        head_feats = jnp.concatenate(
            [last_feat[:, None, :], feats[:, :-1]], axis=1)
        _, _, e_kv = eagle_forward(
            eparams, e_local, e_kv, tokens, head_feats, positions,
            active=active, backend=backend, logits_mode="none",
            tp_axis="tp")
        idx = jnp.maximum(n_real - 1, 0)
        new_last = jnp.take_along_axis(
            feats, idx[:, None, None], axis=1)[:, 0]
        new_last = jnp.where((active & (n_real > 0))[:, None],
                             new_last, last_feat)
        return kv, e_kv, new_last

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(param_specs(params, tp), eagle_param_specs(eparams, tp),
                  kv_specs(kv), kv_specs(e_kv), tok_spec, tok_spec,
                  P("dp"), feat_spec, P("dp"), emb_spec, use_spec),
        out_specs=(kv_specs(kv), kv_specs(e_kv), feat_spec),
        check_vma=False)
    return f(params, eparams, kv, e_kv, tokens, positions, active,
             last_feat, n_real, embeds, use_embeds)


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "e_llm", "n_steps", "k", "backend", "mesh",
                     "sample"),
    donate_argnums=(2, 3),
)
def tp_eagle_spec_scan(tparams: LlamaParams, eparams,
                       t_kv: KVCache, e_kv: KVCache, root: jax.Array,
                       root_feat: jax.Array, t_llm: LLMConfig,
                       e_llm: LLMConfig, n_steps: int, k: int,
                       mesh: Mesh, backend: str = "auto",
                       active: jax.Array | None = None,
                       rngs: jax.Array | None = None,
                       temp: jax.Array | None = None,
                       top_k: jax.Array | None = None,
                       top_p: jax.Array | None = None,
                       sample: bool = False):
    """eagle_spec_scan inside ONE shard_map over the (dp, tp) mesh
    (see tp_chain_spec_scan): the whole multi-step
    draft->verify->accept cycle runs with LOCAL weight shards and
    explicit megatron collectives; slots shard over dp."""
    from ..speculative.eagle import eagle_spec_scan

    tp = mesh.shape["tp"]
    assert mesh.shape.get("sp", 1) == 1, "spec x sp unsupported"
    t_local = local_llm_config(t_llm, tp)
    e_local = local_llm_config(e_llm, tp)
    sp = _spec_arg_specs(t_kv, e_kv)
    feat_spec = P("dp", None)

    def body(tparams, eparams, t_kv, e_kv, root, root_feat, active,
             rngs, temp, top_k, top_p):
        t_kv, _pt = _remap_paged_dp(t_kv)
        out = eagle_spec_scan(
            _localize_params(tparams), _localize_eagle(eparams),
            t_kv, e_kv, root, root_feat, t_local, e_local, n_steps, k,
            backend=backend, active=active, rngs=rngs, temp=temp,
            top_k=top_k, top_p=top_p, sample=sample, tp_axis="tp")
        return out[:2] + (_restore_paged_dp(out[2], _pt),) + out[3:]

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(param_specs(tparams, tp), eagle_param_specs(eparams, tp),
                  sp["tkv"], sp["dkv"], sp["vec"], feat_spec, sp["vec"],
                  sp["rng"], sp["vec"], sp["vec"], sp["vec"]),
        out_specs=(P(None, "dp", None), P(None, "dp"), sp["tkv"],
                   sp["dkv"], sp["vec"], feat_spec, sp["rng"]),
        check_vma=False)
    return f(tparams, eparams, t_kv, e_kv, root, root_feat, active,
             rngs, temp, top_k, top_p)


@functools.partial(
    jax.jit,
    static_argnames=("t_llm", "e_llm", "n_steps", "tree_key", "backend",
                     "mesh", "sample"),
    donate_argnums=(2, 3),
)
def tp_eagle_tree_spec_scan(tparams: LlamaParams, eparams,
                            t_kv: KVCache, e_kv: KVCache,
                            root: jax.Array, root_feat: jax.Array,
                            t_llm: LLMConfig, e_llm: LLMConfig,
                            n_steps: int, tree_key: tuple, mesh: Mesh,
                            backend: str = "auto",
                            active: jax.Array | None = None,
                            rngs: jax.Array | None = None,
                            temp: jax.Array | None = None,
                            top_k: jax.Array | None = None,
                            top_p: jax.Array | None = None,
                            sample: bool = False):
    """eagle_tree_spec_scan inside one shard_map (EAGLE-2-style trees
    on the tp serving path)."""
    from ..speculative.eagle import eagle_tree_spec_scan

    tp = mesh.shape["tp"]
    assert mesh.shape.get("sp", 1) == 1, "spec x sp unsupported"
    t_local = local_llm_config(t_llm, tp)
    e_local = local_llm_config(e_llm, tp)
    sp = _spec_arg_specs(t_kv, e_kv)
    feat_spec = P("dp", None)

    def body(tparams, eparams, t_kv, e_kv, root, root_feat, active,
             rngs, temp, top_k, top_p):
        t_kv, _pt = _remap_paged_dp(t_kv)
        out = eagle_tree_spec_scan(
            _localize_params(tparams), _localize_eagle(eparams),
            t_kv, e_kv, root, root_feat, t_local, e_local, n_steps,
            tree_key, backend=backend, active=active, rngs=rngs,
            temp=temp, top_k=top_k, top_p=top_p, sample=sample,
            tp_axis="tp")
        return out[:2] + (_restore_paged_dp(out[2], _pt),) + out[3:]

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(param_specs(tparams, tp), eagle_param_specs(eparams, tp),
                  sp["tkv"], sp["dkv"], sp["vec"], feat_spec, sp["vec"],
                  sp["rng"], sp["vec"], sp["vec"], sp["vec"]),
        out_specs=(P(None, "dp", None), P(None, "dp"), sp["tkv"],
                   sp["dkv"], sp["vec"], feat_spec, sp["rng"]),
        check_vma=False)
    return f(tparams, eparams, t_kv, e_kv, root, root_feat, active,
             rngs, temp, top_k, top_p)
