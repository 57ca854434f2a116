"""Device-mesh sharding for weights, KV cache, and activations.

The scale-out dimension is net-new vs the single-device reference
(SURVEY §2.3): tensor parallelism over ICI + data/slot parallelism over
DCN, expressed as NamedShardings on the param/KV pytrees; XLA GSPMD
inserts the all-gather/reduce-scatter collectives inside the jitted
step (the role FastRPC + host memcpy plays in the reference's
chunk-split NPU execution, C17, and the absent inter-chip role).

Layout (megatron-style):
  - wq/wk/wv, ffn gate/up: column-parallel (output features over "tp")
  - wo, ffn down: row-parallel (input features over "tp")
  - embedding: replicated vocab, hidden dim over "tp" is NOT used —
    rows are gathered by token id, so shard the vocab axis instead and
    let XLA all-reduce the one-hot gather; small tables just replicate
  - lm_head: column-parallel over vocab
  - KV cache: kv heads over "tp", slots over "dp"
  - activations: batch/slots over "dp"
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kv.cache import KVCache
from ..models.llama import LayerWeights, LlamaParams, QEmbedding
from ..ops.qmatmul import QLinear


def make_mesh(shape: dict[str, int] | None = None,
              devices: list | None = None) -> Mesh:
    """Build a (dp, sp, tp) mesh. shape e.g. {"dp": 2, "tp": 4} or
    {"sp": 2, "tp": 4}; default puts all devices on "tp". "sp"
    (sequence parallel) shards the KV cache's time axis — long-context
    memory and attention bandwidth split across chips (net-new vs the
    reference, whose context is hard-capped by static NPU graph shapes,
    SURVEY §5 long-context)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not shape:
        shape = {"dp": 1, "sp": 1, "tp": n}
    dp = int(shape.get("dp", 1))
    pp = int(shape.get("pp", 1))  # pipeline stages (parallel/pp.py)
    ep = int(shape.get("ep", 1))  # expert parallel (MoE FFNs)
    sp = int(shape.get("sp", 1))
    tp = int(shape.get("tp", n // (dp * pp * ep * sp)))
    assert dp * pp * ep * sp * tp == n, \
        f"mesh {dp}x{pp}x{ep}x{sp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, pp, ep, sp, tp)
    return Mesh(arr, ("dp", "pp", "ep", "sp", "tp"))


def _shardable(dim_size: int, n_shards: int) -> bool:
    return dim_size % n_shards == 0


def _qlinear_spec(lin_q_shape: tuple[int, ...], col_parallel: bool,
                  tp: int) -> tuple[P, P]:
    """PartitionSpecs for (q, scales/bias) of a [(L,)? K(,/2), N] QLinear."""
    ndim = len(lin_q_shape)
    lead = (None,) * (ndim - 2)
    if col_parallel:
        if not _shardable(lin_q_shape[-1], tp):
            return P(), P()
        return P(*lead, None, "tp"), P(*lead, None, "tp")
    if not _shardable(lin_q_shape[-2], tp):
        return P(), P()
    return P(*lead, "tp", None), P(*lead, "tp", None)


def _put(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _shard_qlinear(lin: QLinear, mesh: Mesh, col_parallel: bool) -> QLinear:
    tp = mesh.shape["tp"]
    qspec, sspec = _qlinear_spec(lin.q.shape, col_parallel, tp)
    # row-parallel shards the K axis of BOTH q and the per-block scales;
    # the scales have K/32 rows, which must also divide (tiny models
    # fail this even when K itself divides) — else replicate
    if not col_parallel and sspec != P() \
            and lin.scales.shape[-2] % tp != 0:
        qspec, sspec = P(), P()
    import dataclasses

    return dataclasses.replace(
        lin,
        q=_put(lin.q, mesh, qspec),
        scales=_put(lin.scales, mesh, sspec),
        bias=None if lin.bias is None else _put(lin.bias, mesh, sspec),
    )


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    """Place model params on the mesh with TP shardings (handles both
    stacked-scan and unrolled-tuple layer layouts)."""
    import dataclasses

    tp = mesh.shape["tp"]

    def col(l: QLinear | None) -> QLinear | None:
        return None if l is None else _shard_qlinear(l, mesh, True)

    def row(l: QLinear | None) -> QLinear | None:
        return None if l is None else _shard_qlinear(l, mesh, False)

    def repl(x):
        return None if x is None else _put(x, mesh, P())

    def bias_col(b):
        if b is None:
            return None
        if not _shardable(b.shape[-1], tp):
            return repl(b)
        spec = P(None, "tp") if b.ndim == 2 else P("tp")
        return _put(b, mesh, spec)

    def shard_layer(lw):
        return dataclasses.replace(
            lw,
            attn_norm=repl(lw.attn_norm), ffn_norm=repl(lw.ffn_norm),
            wq=col(lw.wq), wk=col(lw.wk), wv=col(lw.wv), wo=row(lw.wo),
            bq=bias_col(lw.bq), bk=bias_col(lw.bk), bv=bias_col(lw.bv),
            w_gate=col(lw.w_gate), w_up=col(lw.w_up), w_down=row(lw.w_down),
            # NOTE: fused qkv concatenates uneven q/k/v blocks; column
            # sharding still works (GSPMD reshards the split) but
            # multi-chip deployments should prefer fuse=False
            wqkv=col(lw.wqkv), bqkv=bias_col(lw.bqkv), wgu=col(lw.wgu),
            # MoE experts: matmul dims shard over tp like the dense FFN
            # (GSPMD path; true expert-parallel "ep" locality is the
            # shard_map path, parallel/tp.py — the stacked flat-view
            # reshape would force GSPMD to reshard an ep-sharded axis)
            router=repl(lw.router),
            w_gate_exps=col(lw.w_gate_exps),
            w_up_exps=col(lw.w_up_exps),
            w_down_exps=row(lw.w_down_exps),
        )

    if isinstance(params.layers, (tuple, list)):
        layers = tuple(shard_layer(lw) for lw in params.layers)
    else:
        layers = shard_layer(params.layers)
    # embedding: shard vocab axis when divisible (gather all-reduces),
    # else replicate
    emb = params.embed
    if _shardable(emb.q.shape[0], tp):
        espec = P("tp", None)
    else:
        espec = P()
    embed = dataclasses.replace(
        emb,
        q=_put(emb.q, mesh, espec),
        scales=_put(emb.scales, mesh, espec),
        bias=None if emb.bias is None else _put(emb.bias, mesh, espec),
    )
    return dataclasses.replace(
        params,
        embed=embed,
        layers=layers,
        out_norm=repl(params.out_norm),
        lm_head=_shard_qlinear(params.lm_head, mesh, True),
    )


def shard_kv(kv: KVCache, mesh: Mesh) -> KVCache:
    """KV heads over tp, slots over dp, cache time over sp.

    With the time axis sharded, GSPMD turns the dense/chunked attention
    einsums into per-shard partial softmax terms combined by
    collectives, and the functional KV scatters into shard-local writes
    (OOB lanes of other shards drop) — each chip holds and streams
    1/sp of the context."""
    import dataclasses

    from ..kv.paged import PagedKVCache

    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]
    sp = mesh.shape.get("sp", 1)
    if isinstance(kv, PagedKVCache):
        # paged pool [L, P, H, page, D]: shard kv heads over tp (each
        # chip stores the full pool for its head shard — the per-layer
        # whole-page gather and the page-table scatters stay local);
        # page table / mask / pos replicate. The pool is shared across
        # slots, so dp/sp axes don't apply to it.
        Hp = kv.k.shape[2]
        h_ax = "tp" if _shardable(Hp, tp) else None
        kvspec = P(None, None, h_ax, None, None)
        scspec = P(None, None, h_ax, None)
        return dataclasses.replace(
            kv,
            k=_put(kv.k, mesh, kvspec),
            v=_put(kv.v, mesh, kvspec),
            k_scale=_put(kv.k_scale, mesh, scspec),
            v_scale=_put(kv.v_scale, mesh, scspec),
            page_table=_put(kv.page_table, mesh, P()),
            mask=_put(kv.mask, mesh, P()),
            pos=_put(kv.pos, mesh, P()),
        )
    L, S, H, T, D = kv.k.shape
    s_ax = "dp" if _shardable(S, dp) and dp > 1 else None
    h_ax = "tp" if _shardable(H, tp) else None
    t_ax = "sp" if _shardable(T, sp) and sp > 1 else None
    kvspec = P(None, s_ax, h_ax, t_ax, None)
    scspec = P(None, s_ax, h_ax, t_ax)
    quant = kv.quantized
    return dataclasses.replace(
        kv,
        k=_put(kv.k, mesh, kvspec),
        v=_put(kv.v, mesh, kvspec),
        k_scale=_put(kv.k_scale, mesh, scspec if quant else P()),
        v_scale=_put(kv.v_scale, mesh, scspec if quant else P()),
        mask=_put(kv.mask, mesh, P(s_ax, t_ax)),
        pos=_put(kv.pos, mesh, P(s_ax)),
    )
