"""Paged INT8 KV pool: memory oversubscription across batch slots.

Net-new vs the reference (its KV is a per-sequence ring with a hard
capacity assert, src/core/kv_cache.hpp:233-236): the dense KVCache
([L, S, H, T, D]) reserves max_seq for every slot, so HBM limits
S * max_seq even though most requests are short. Here K/V live in a
shared pool of fixed-size pages ([L, P, H, page, D]) and each slot maps
its logical positions onto pool pages through a page table — total
cache memory is P * page tokens regardless of how many slots exist or
how long any one of them is allowed to grow (vLLM-style paging, done
the TPU way: the page table is a device array consumed inside jit,
every mutation is a functional scatter, and page allocation is plain
host Python in the scheduler between ticks).

Design notes (TPU-first):
  - page slabs keep the cache layout's contiguity: a page is [H, page,
    D] per layer with D on lanes and the page's tokens on sublanes, so
    attention over a gathered slot view streams exactly like the dense
    cache.
  - reads gather pages with jnp.take(axis=pool) — one gather per layer
    inside the layer scan; the Pallas flash-decode path can instead
    scalar-prefetch the page table (page = chunk) and skip the
    materialized view.
  - writes translate logical positions -> (page id, offset) with the
    same mode="drop" OOB redirects as the dense cache: position without
    an allocated page scatters into nothing (jit-safe backpressure; the
    host allocator is responsible for never letting that happen).
  - mask/pos semantics (advance/rollback/truncate/set_mask) are
    identical to the dense cache — they never touch K/V storage.

The host-side `PagePool` allocator lives here too: a free list plus
per-slot ownership; the scheduler calls ensure()/release() between
device ticks and pushes the resulting page table with assign_pages().
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale", "page_table", "mask",
                 "pos"],
    meta_fields=["page_size"],
)
@dataclass
class PagedKVCache:
    """Shared-pool paged KV state (always int8-quantized).

    k/v:       [L, P, H, page, D] int8 pool slabs (P pool pages)
    k_scale/
    v_scale:   [L, P, H, page] f32 per-(token, head) scales
    page_table:[S, max_pages] int32 — pool page id, or P = unallocated
    mask:      [S, T_logical] bool (T_logical = max_pages * page)
    pos:       [S] int32
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    page_table: jax.Array
    mask: jax.Array
    pos: jax.Array
    page_size: int

    quantized = True  # pool is always int8 (parity with the default cache)

    # -- construction -------------------------------------------------------

    @classmethod
    def create(cls, n_layers: int, n_slots: int, max_seq: int,
               n_kv_heads: int, head_dim: int, *, n_pages: int,
               page_size: int = 64) -> "PagedKVCache":
        """max_seq = per-slot logical capacity (rounded up to pages);
        n_pages = POOL capacity in pages — oversubscribed when
        n_pages * page_size < n_slots * max_seq."""
        max_pages = -(-max_seq // page_size)
        t_logical = max_pages * page_size
        shape = (n_layers, n_pages, n_kv_heads, page_size, head_dim)
        return cls(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
            page_table=jnp.full((n_slots, max_pages), n_pages, jnp.int32),
            mask=jnp.zeros((n_slots, t_logical), jnp.bool_),
            pos=jnp.zeros(n_slots, jnp.int32),
            page_size=page_size,
        )

    # -- shape helpers ------------------------------------------------------

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def n_slots(self) -> int:
        return self.page_table.shape[0]

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]

    @property
    def max_seq(self) -> int:
        """Logical per-slot capacity (what forward()/schedulers see)."""
        return self.max_pages * self.page_size

    # -- logical position -> pool coordinates --------------------------------

    def locate(self, positions: jax.Array) -> tuple[jax.Array, jax.Array]:
        """[S, ...] logical positions -> (page ids [S, ...], offsets).

        Invalid positions (OOB, or page not allocated) return page id
        == n_pages, which every pool scatter drops and every gather
        clips (the clipped read is masked off by visibility)."""
        P = self.n_pages
        T = self.max_seq
        ok = (positions >= 0) & (positions < T)
        pidx = jnp.where(ok, positions // self.page_size, 0)
        srows = jnp.arange(self.page_table.shape[0], dtype=jnp.int32)
        srows = srows.reshape((-1,) + (1,) * (positions.ndim - 1))
        pages = self.page_table[srows, pidx]  # [S, ...]
        pages = jnp.where(ok & (pages < P), pages, P)
        offs = jnp.where(ok, positions % self.page_size, 0)
        return pages, offs

    # -- forward()-side slab ops (pure functions of one layer's slabs) ------

    @staticmethod
    def scatter_slab(slab: jax.Array, vals: jax.Array, pages: jax.Array,
                     offs: jax.Array) -> jax.Array:
        """slab [P, H, page(, D)], vals [S, Tq, H(, D)], pages/offs
        [S, Tq] — writes vals[s, t] at slab[pages[s, t], :, offs[s, t]];
        page id == P drops."""
        return slab.at[pages, :, offs].set(vals.astype(slab.dtype),
                                           mode="drop")

    def gather_slab(self, slab: jax.Array) -> jax.Array:
        """slab [P, H, page(, D)] -> per-slot dense view
        [S, H, T_logical(, D)] in the dense cache's layout (gather of
        whole pages; unallocated pages read page 0's data and are
        masked off by visibility)."""
        S, MP = self.page_table.shape
        pt = jnp.minimum(self.page_table, self.n_pages - 1)
        out = jnp.take(slab, pt, axis=0)  # [S, MP, H, page(, D)]
        out = jnp.moveaxis(out, 2, 1)  # [S, H, MP, page(, D)]
        return out.reshape((S, slab.shape[1], MP * self.page_size)
                           + slab.shape[3:])

    # -- mutation (functional) ----------------------------------------------

    @staticmethod
    def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        from .cache import KVCache

        return KVCache.quantize_kv(x)

    def append(self, layer: jax.Array | int, k_new: jax.Array,
               v_new: jax.Array, positions: jax.Array) -> "PagedKVCache":
        """Dense-cache-compatible append (one layer): k_new/v_new
        [S, T_new, H, D] float, positions [S, T_new] logical."""
        pages, offs = self.locate(positions)
        kq, ks = self.quantize_kv(k_new)
        vq, vs = self.quantize_kv(v_new)
        return replace(
            self,
            k=self.k.at[layer].set(
                self.scatter_slab(self.k[layer], kq, pages, offs)),
            v=self.v.at[layer].set(
                self.scatter_slab(self.v[layer], vq, pages, offs)),
            k_scale=self.k_scale.at[layer].set(
                self.scatter_slab(self.k_scale[layer], ks, pages, offs)),
            v_scale=self.v_scale.at[layer].set(
                self.scatter_slab(self.v_scale[layer], vs, pages, offs)),
        )

    # mask/pos semantics are storage-independent — reuse the dense
    # cache's implementations verbatim
    def advance(self, positions, active=None, visible=None, pos_axis=None):
        from .cache import KVCache

        return KVCache.advance(self, positions, active, visible, pos_axis)

    def rollback(self, n, active=None):
        from .cache import KVCache

        return KVCache.rollback(self, n, active)

    def truncate(self, n, active=None):
        from .cache import KVCache

        return KVCache.truncate(self, n, active)

    def set_mask(self, slot, index, value):
        from .cache import KVCache

        return KVCache.set_mask(self, slot, index, value)

    def reset_slot(self, slot) -> "PagedKVCache":
        """Clear one slot's logical state. Pool pages are returned by
        the HOST allocator (PagePool.release) + assign_pages — the
        device state only forgets the mapping."""
        return replace(
            self,
            mask=self.mask.at[slot].set(False),
            pos=self.pos.at[slot].set(0),
        )

    # -- speculation primitives ----------------------------------------------

    def copy_token(self, slot: jax.Array | int, dst: jax.Array,
                   src: jax.Array) -> "PagedKVCache":
        """Copy a cached entry src -> dst within a slot, all layers
        (tree-verify compaction), in pool coordinates."""
        pos2 = jnp.stack([jnp.asarray(src), jnp.asarray(dst)])  # [2]
        # locate() expects a leading slot axis; build [S, 2] with only
        # `slot`'s row carrying real positions
        S = self.n_slots
        rows = jnp.full((S, 2), -1, jnp.int32)
        rows = rows.at[slot].set(pos2.astype(jnp.int32))
        pages, offs = self.locate(rows)  # [S, 2]
        sp, so = pages[:, 0], offs[:, 0]
        dp, do = pages[:, 1], offs[:, 1]

        def per_layer(arr_l):
            vals = arr_l[jnp.minimum(sp, self.n_pages - 1), :, so]
            return arr_l.at[dp, :, do].set(vals, mode="drop")

        out = replace(self,
                      k=jax.vmap(per_layer)(self.k),
                      v=jax.vmap(per_layer)(self.v),
                      k_scale=jax.vmap(per_layer)(self.k_scale),
                      v_scale=jax.vmap(per_layer)(self.v_scale))
        return out

    def gather_tokens(self, slot_indices: jax.Array,
                      src_positions: jax.Array,
                      dst_start: jax.Array) -> "PagedKVCache":
        """Batched compaction (tree-verify): move src_positions[s, i]
        -> dst_start[s] + i. Padded (-1) sources drop."""
        S, n = src_positions.shape
        dst = dst_start[:, None] + jnp.arange(n)[None, :]
        src_ok = (src_positions >= 0) & (src_positions < self.max_seq)
        sp, so = self.locate(jnp.where(src_ok, src_positions, -1))
        dpos = jnp.where(src_ok, dst, -1)
        dp, do = self.locate(dpos)

        def per_layer(arr_l):
            vals = arr_l[jnp.minimum(sp, self.n_pages - 1), :, so]
            return arr_l.at[dp, :, do].set(vals, mode="drop")

        return replace(self,
                       k=jax.vmap(per_layer)(self.k),
                       v=jax.vmap(per_layer)(self.v),
                       k_scale=jax.vmap(per_layer)(self.k_scale),
                       v_scale=jax.vmap(per_layer)(self.v_scale))

    def commit_tokens(self, slot_indices: jax.Array,
                      src_positions: jax.Array,
                      n_accept: jax.Array) -> "PagedKVCache":
        """Tree-verify acceptance (dense-cache-compatible)."""
        S, n_max = src_positions.shape
        dst_start = self.pos.astype(jnp.int32)
        out = self.gather_tokens(slot_indices, src_positions, dst_start)
        col = jnp.arange(n_max)[None, :]
        positions = dst_start[:, None] + col
        valid = col < n_accept[:, None]
        positions = jnp.where(valid, positions, -1)
        T = self.max_seq
        idx_set = jnp.where((positions >= 0) & (positions < T), positions, T)
        mask = jax.vmap(lambda m, i: m.at[i].set(True, mode="drop"))(
            out.mask, idx_set)
        return replace(out, mask=mask,
                       pos=self.pos + n_accept.astype(jnp.int32))

    # -- prefix snapshots (format-compatible with the dense cache) ----------

    def save_slot_prefix(self, slot: int, n: int) -> dict:
        """Snapshot the first n tokens of one slot as DENSE arrays —
        the same dict format KVCache.save_slot_prefix produces, so the
        prefix cache interoperates across paged/dense backends."""
        n_pg = -(-n // self.page_size)
        pt = np.asarray(self.page_table[slot][:n_pg])
        pt = np.minimum(pt, self.n_pages - 1)
        idx = jnp.asarray(pt)

        def dense(arr):  # [L, P, H, page(, D)] -> [L, H, n(, D)]
            g = jnp.take(arr, idx, axis=1)  # [L, n_pg, H, page(, D)]
            g = jnp.moveaxis(g, 2, 1)
            g = g.reshape((arr.shape[0], arr.shape[2],
                           n_pg * self.page_size) + arr.shape[4:])
            return g[:, :, :n]

        return {"n": n, "k": dense(self.k), "v": dense(self.v),
                "k_scale": dense(self.k_scale),
                "v_scale": dense(self.v_scale)}

    def restore_slot_prefix(self, slot: int, saved: dict) -> "PagedKVCache":
        """Write a dense prefix snapshot into this slot's (already
        allocated) pages; mask/pos cover exactly the prefix."""
        n = saved["n"]
        T = self.max_seq
        positions = jnp.full((self.n_slots, n), -1, jnp.int32)
        positions = positions.at[slot].set(jnp.arange(n, dtype=jnp.int32))
        pages, offs = self.locate(positions)

        def scat(slab, vals_l):  # slab [P, H, page(,D)], vals [H, n(,D)]
            vals = jnp.moveaxis(vals_l, 1, 0)[None]  # [1, n, H(, D)]
            vals = jnp.broadcast_to(vals, (self.n_slots,) + vals.shape[1:])
            return slab.at[pages, :, offs].set(vals.astype(slab.dtype),
                                               mode="drop")

        out = replace(
            self,
            k=jax.vmap(scat)(self.k, saved["k"]),
            v=jax.vmap(scat)(self.v, saved["v"]),
            k_scale=jax.vmap(scat)(self.k_scale, saved["k_scale"]),
            v_scale=jax.vmap(scat)(self.v_scale, saved["v_scale"]),
            mask=self.mask.at[slot].set(jnp.arange(T) < n),
            pos=self.pos.at[slot].set(n),
        )
        return out

    # -- host-side page-table updates ----------------------------------------

    def assign_pages(self, table: np.ndarray) -> "PagedKVCache":
        """Replace the whole page table (host allocator pushes its
        mirror after allocate/release). table: [S, max_pages] int32
        with n_pages = unallocated."""
        return replace(self, page_table=jnp.asarray(table, jnp.int32))


class PagePool:
    """Host-side page allocator: free list + per-slot ownership.

    The scheduler calls ensure()/release() between device ticks and
    pushes `table` (the numpy mirror) with PagedKVCache.assign_pages
    when it changed. No device state lives here.

    n_groups > 1 partitions the pool for DATA-PARALLEL serving
    (paged x dp under a tp_mesh): dp shard g's slots (a contiguous
    slot range, matching shard_map's axis-0 split) may only hold pages
    from its own partition [g*P/dp, (g+1)*P/dp) — each shard then
    scatters exclusively into its local slab shard, so the pool can
    shard over "dp" instead of forcing replication (parallel/tp.py
    kv_specs). Page ids in the table stay GLOBAL; the shard_map body
    remaps them to shard-local ids."""

    def __init__(self, n_pages: int, n_slots: int, max_pages: int,
                 page_size: int, n_groups: int = 1):
        if n_pages % n_groups or n_slots % n_groups:
            raise ValueError(
                f"pages ({n_pages}) and slots ({n_slots}) must divide "
                f"into {n_groups} dp groups")
        self.n_pages = n_pages
        self.page_size = page_size
        self.max_pages = max_pages
        self.n_groups = n_groups
        self.group_pages = n_pages // n_groups
        self._slots_per_group = n_slots // n_groups
        self._free: list[list[int]] = [
            list(range(g * self.group_pages, (g + 1) * self.group_pages))
            for g in range(n_groups)]
        self.owned: list[list[int]] = [[] for _ in range(n_slots)]
        self.table = np.full((n_slots, max_pages), n_pages, np.int32)
        self.dirty = False

    def group_of(self, slot: int) -> int:
        return slot // self._slots_per_group

    @property
    def n_free(self) -> int:
        return sum(len(f) for f in self._free)

    def n_free_for(self, slot: int) -> int:
        """Free pages available to `slot` (its dp group's partition)."""
        return len(self._free[self.group_of(slot)])

    def ensure(self, slot: int, n_tokens: int) -> bool:
        """Grow `slot`'s mapping to cover n_tokens logical positions.
        Returns False (allocating nothing further) when the pool or the
        slot's logical range is exhausted — caller must preempt/defer."""
        need = -(-n_tokens // self.page_size)
        if need > self.max_pages:
            return False
        free = self._free[self.group_of(slot)]
        cur = len(self.owned[slot])
        while cur < need:
            if not free:
                return False
            pg = free.pop()
            self.table[slot, cur] = pg
            self.owned[slot].append(pg)
            cur += 1
            self.dirty = True
        return True

    def release(self, slot: int) -> None:
        """Return all of a slot's pages to the pool."""
        if self.owned[slot]:
            self._free[self.group_of(slot)].extend(self.owned[slot])
            self.owned[slot] = []
            self.table[slot, :] = self.n_pages
            self.dirty = True

    def flush(self, kv: PagedKVCache) -> PagedKVCache:
        """Push the mirror to the device array if it changed."""
        if self.dirty:
            kv = kv.assign_pages(self.table)
            self.dirty = False
        return kv
