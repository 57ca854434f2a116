"""INT8 KV cache with mask/rollback/copy semantics for tree speculation.

TPU-native re-design of the reference's backend-agnostic masked ring KV
cache (reference src/core/kv_cache.hpp:97-278): the reference mutates
per-layer ring buffers imperatively; here the cache is a jax pytree of
statically-shaped arrays and every mutation is a functional scatter
update usable inside jit with buffer donation.

Semantics preserved from the reference interface:
  - append(k, v, positions)      == save_tokens + advance_tokens
  - rollback(n)                  == rollback_tokens (kv_cache.hpp:256) —
                                    the primitive enabling tree drafts
  - set_mask(index, value)       == mask/unmask_tokens (switch_parent)
  - copy(dst_index, src_index)   == copy_tokens (verify's compaction)
  - truncate(n)                  == truncate_tokens (reset to a prefix,
                                    e.g. a persistent system-prompt KV)

Layout: [n_layers, n_slots, n_kv_heads, max_seq, head_dim] — the
sequence dim sits inside each head so a (slot, head)'s K/V slab is
CONTIGUOUS [T, D]: attention kernels (XLA today, Pallas flash-decode
next) stream it without strided gathers, and per-token scatters index
axis -2. K/V quantize per (token, head) to int8 with an f32 scale,
halving HBM traffic vs the reference's fp16 NPU KV
(causal_models.hpp:121-131).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace
from typing import Any

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale", "mask", "pos"],
    meta_fields=["quantized"],
)
@dataclass
class KVCache:
    """Per-model KV state (all arrays batched over layers and slots)."""

    k: jax.Array  # [L, S, H, T, D] int8 (quantized) or bf16
    v: jax.Array  # [L, S, H, T, D]
    k_scale: jax.Array  # [L, S, H, T] f32 (dummy when not quantized)
    v_scale: jax.Array
    mask: jax.Array  # [S, T] bool — position visible to attention
    pos: jax.Array  # [S] int32 — number of stored tokens (next write index)
    quantized: bool

    # -- construction -------------------------------------------------------

    @classmethod
    def create(cls, n_layers: int, n_slots: int, max_seq: int,
               n_kv_heads: int, head_dim: int,
               dtype: str = "int8") -> "KVCache":
        quantized = dtype == "int8"
        shape = (n_layers, n_slots, n_kv_heads, max_seq, head_dim)
        if quantized:
            k = jnp.zeros(shape, jnp.int8)
            v = jnp.zeros(shape, jnp.int8)
            ks = jnp.zeros(shape[:-1], jnp.float32)
            vs = jnp.zeros(shape[:-1], jnp.float32)
            return cls(k, v, ks, vs, jnp.zeros((n_slots, max_seq), jnp.bool_),
                       jnp.zeros(n_slots, jnp.int32), True)
        k = jnp.zeros(shape, jnp.bfloat16)
        # dummies keep a leading n_layers axis so lax.scan over layers
        # works; distinct buffers so donation doesn't alias
        dummy = jnp.zeros((n_layers, 1, 1, 1), jnp.float32)
        dummy2 = jnp.zeros((n_layers, 1, 1, 1), jnp.float32)
        return cls(k, jnp.zeros_like(k), dummy, dummy2,
                   jnp.zeros((n_slots, max_seq), jnp.bool_),
                   jnp.zeros(n_slots, jnp.int32), False)

    # -- shape helpers ------------------------------------------------------

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    @property
    def n_slots(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    # -- quantization -------------------------------------------------------

    @staticmethod
    def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """[..., H, D] float -> (int8 values, f32 per-[..., H] scale)."""
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = absmax / 127.0
        inv = jnp.where(scale > 0, 1.0 / jnp.where(scale == 0, 1.0, scale), 0.0)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]),
                     -127, 127).astype(jnp.int8)
        return q, scale

    # -- mutation (functional; donate self for in-place) --------------------

    def append(self, layer: jax.Array | int, k_new: jax.Array,
               v_new: jax.Array, positions: jax.Array) -> "KVCache":
        """Write new tokens' K/V for one layer at explicit positions.

        k_new/v_new: [S, T_new, H, D] float; positions: [S, T_new] int32.
        (Values transpose internally to the [H, T, D] cache layout.)
        Positions >= max_seq are dropped (mirrors the reference's capacity
        assert, kv_cache.hpp:233-236, but jit-safely). Does NOT advance
        pos/mask — call `advance` once after all layers are written.
        """
        T = self.max_seq
        # out-of-range positions are redirected past the end and dropped
        # by the scatter (mode='drop') — jit-safe capacity handling
        idx = jnp.where((positions >= 0) & (positions < T), positions, T)

        def per_slot(cache_s, new_s, idx_s):
            # cache_s [H, T, ...]; new_s [H, Tn, ...]; scatter axis 1
            return cache_s.at[:, idx_s].set(new_s.astype(cache_s.dtype),
                                            mode="drop")

        if self.quantized:
            kq, ks = self.quantize_kv(k_new)
            vq, vs = self.quantize_kv(v_new)
            k_l = jax.vmap(per_slot)(self.k[layer], kq.transpose(0, 2, 1, 3), idx)
            v_l = jax.vmap(per_slot)(self.v[layer], vq.transpose(0, 2, 1, 3), idx)
            ks_l = jax.vmap(per_slot)(self.k_scale[layer],
                                      ks.transpose(0, 2, 1), idx)
            vs_l = jax.vmap(per_slot)(self.v_scale[layer],
                                      vs.transpose(0, 2, 1), idx)
            return replace(
                self,
                k=self.k.at[layer].set(k_l),
                v=self.v.at[layer].set(v_l),
                k_scale=self.k_scale.at[layer].set(ks_l),
                v_scale=self.v_scale.at[layer].set(vs_l),
            )
        k_l = jax.vmap(per_slot)(self.k[layer], k_new.transpose(0, 2, 1, 3), idx)
        v_l = jax.vmap(per_slot)(self.v[layer], v_new.transpose(0, 2, 1, 3), idx)
        return replace(self, k=self.k.at[layer].set(k_l),
                       v=self.v.at[layer].set(v_l))

    def advance(self, positions: jax.Array, active: jax.Array | None = None,
                visible: jax.Array | None = None,
                pos_axis: str | None = None) -> "KVCache":
        """Mark written positions visible and bump pos.

        positions: [S, T_new]; active: [S] bool (rows that actually ran);
        visible: [S, T_new] bool (False keeps a written token masked —
        used by tree drafts whose siblings must stay invisible).
        pos_axis: inside a shard_map with the TIME axis sharded, each
        shard only stores its own slice of the batch — psum the real
        counts over the axis so pos stays the GLOBAL sequence length
        (every global position lands on exactly one shard).
        """
        S, T_new = positions.shape
        if active is None:
            active = jnp.ones(S, jnp.bool_)
        if visible is None:
            visible = jnp.ones((S, T_new), jnp.bool_)
        T = self.max_seq
        in_range = (positions >= 0) & (positions < T)
        write = active[:, None] & in_range  # positions whose mask we touch
        # redirect untouched lanes out of bounds; scatter drops them —
        # avoids duplicate-index clobbering between touched/untouched lanes
        idx_set = jnp.where(write & visible, positions, T)
        idx_clear = jnp.where(write & ~visible, positions, T)

        def per_slot(mask_s, set_s, clear_s):
            mask_s = mask_s.at[set_s].set(True, mode="drop")
            return mask_s.at[clear_s].set(False, mode="drop")

        mask = jax.vmap(per_slot)(self.mask, idx_set, idx_clear)
        # bump pos by the per-slot count of REAL stored positions, not the
        # static T_new: batched prefill pads the final chunk with -1 lanes
        # (engine/scheduler.py) and counting those shifted every later
        # token's RoPE position / write index
        n_real = jnp.sum(write, axis=1).astype(jnp.int32)
        if pos_axis is not None:
            n_real = jax.lax.psum(n_real, pos_axis)
        return replace(self, mask=mask, pos=self.pos + n_real)

    def rollback(self, n: jax.Array | int,
                 active: jax.Array | None = None) -> "KVCache":
        """Drop the last n tokens per active slot (kv_cache.hpp:256)."""
        S, T = self.mask.shape
        if active is None:
            active = jnp.ones(S, jnp.bool_)
        n = jnp.broadcast_to(jnp.asarray(n, jnp.int32), (S,))
        n = jnp.where(active, n, 0)
        new_pos = jnp.maximum(self.pos - n, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
        mask = self.mask & (col < new_pos[:, None])
        return replace(self, mask=mask, pos=new_pos)

    def truncate(self, n: jax.Array | int,
                 active: jax.Array | None = None) -> "KVCache":
        """Keep only the first n tokens (truncate_tokens)."""
        S, T = self.mask.shape
        if active is None:
            active = jnp.ones(S, jnp.bool_)
        n = jnp.broadcast_to(jnp.asarray(n, jnp.int32), (S,))
        new_pos = jnp.where(active, n, self.pos)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
        mask = jnp.where(active[:, None], self.mask & (col < new_pos[:, None]),
                         self.mask)
        return replace(self, mask=mask, pos=new_pos.astype(jnp.int32))

    def set_mask(self, slot: jax.Array | int, index: jax.Array,
                 value: jax.Array | bool) -> "KVCache":
        """mask/unmask single positions (tree switch_parent)."""
        mask = self.mask.at[slot, index].set(value)
        return replace(self, mask=mask)

    def copy_token(self, slot: jax.Array | int, dst: jax.Array,
                   src: jax.Array) -> "KVCache":
        """Copy a cached entry src -> dst within a slot, all layers
        (verify's compaction: token_tree.cpp:190-210 copy + advance)."""
        k = self.k.at[:, slot, :, dst].set(self.k[:, slot, :, src])
        v = self.v.at[:, slot, :, dst].set(self.v[:, slot, :, src])
        out = replace(self, k=k, v=v)
        if self.quantized:
            out = replace(
                out,
                k_scale=self.k_scale.at[:, slot, :, dst].set(
                    self.k_scale[:, slot, :, src]),
                v_scale=self.v_scale.at[:, slot, :, dst].set(
                    self.v_scale[:, slot, :, src]),
            )
        return out

    def gather_tokens(self, slot_indices: jax.Array,
                      src_positions: jax.Array, dst_start: jax.Array) -> "KVCache":
        """Batched compaction: move cached entries src_positions[i] to
        dst_start + i for each listed slot — tree-verify acceptance as a
        single gather+scatter instead of a per-node loop."""
        # src_positions: [S, n]; dst positions are dst_start[:, None] + arange(n)
        S, n = src_positions.shape
        T = self.max_seq
        dst = dst_start[:, None] + jnp.arange(n)[None, :]
        # padded (-1) sources and over-capacity destinations are redirected
        # out of bounds and dropped by the scatter — clipping instead made
        # them collapse onto T-1/position 0 and clobber live entries when a
        # speculative commit ran near cache capacity
        src_ok = (src_positions >= 0) & (src_positions < T)
        safe_src = jnp.clip(src_positions, 0, T - 1)
        safe_dst = jnp.where(src_ok & (dst < T), dst, T)

        def per_layer_slot(arr_ls, src_s, dst_s):
            # arr_ls: [H, T, ...]; gather/scatter along the T axis
            vals = arr_ls[:, src_s]
            return arr_ls.at[:, dst_s].set(vals, mode="drop")

        def per_layer(arr_l):
            return jax.vmap(per_layer_slot)(arr_l, safe_src, safe_dst)

        out = replace(self,
                      k=jax.vmap(per_layer)(self.k),
                      v=jax.vmap(per_layer)(self.v))
        if self.quantized:
            out = replace(
                out,
                k_scale=jax.vmap(per_layer)(self.k_scale),
                v_scale=jax.vmap(per_layer)(self.v_scale),
            )
        return out

    def commit_tokens(self, slot_indices: jax.Array, src_positions: jax.Array,
                      n_accept: jax.Array) -> "KVCache":
        """Tree-verify acceptance: compact the accepted nodes' cached
        entries to the sequence front and advance.

        src_positions: [S, n_max] cache positions of accepted nodes in
        acceptance order (pad with -1 beyond n_accept). Entries move to
        pos .. pos+n_accept-1; mask set there; pos += n_accept.
        (Replaces the reference's per-node copy+advance loop,
        token_tree.cpp:190-210, with one gather/scatter.)
        """
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

    def save_slot_prefix(self, slot: int, n: int) -> dict:
        """Snapshot the first n cached tokens of one slot (device
        arrays) — the in-server prefix cache (shared system prompts)
        stores these and restore_slot_prefix re-seeds new requests
        without re-prefilling. Prefix KV depends only on the prefix
        tokens and positions 0..n-1, so reuse across requests is exact."""
        out = {"n": n,
               "k": self.k[:, slot, :, :n],
               "v": self.v[:, slot, :, :n]}
        if self.quantized:
            out["k_scale"] = self.k_scale[:, slot, :, :n]
            out["v_scale"] = self.v_scale[:, slot, :, :n]
        return out

    def restore_slot_prefix(self, slot: int, saved: dict) -> "KVCache":
        """Write a saved prefix into a (freshly reset) slot; mask/pos
        cover exactly the prefix."""
        n = saved["n"]
        T = self.max_seq
        out = replace(
            self,
            k=self.k.at[:, slot, :, :n].set(saved["k"]),
            v=self.v.at[:, slot, :, :n].set(saved["v"]),
            mask=self.mask.at[slot].set(
                jnp.arange(T) < n),
            pos=self.pos.at[slot].set(n),
        )
        if self.quantized:
            out = replace(
                out,
                k_scale=self.k_scale.at[:, slot, :, :n].set(
                    saved["k_scale"]),
                v_scale=self.v_scale.at[:, slot, :, :n].set(
                    saved["v_scale"]),
            )
        return out

    def reset_slot(self, slot: int | jax.Array) -> "KVCache":
        """Clear one slot (new request in continuous batching)."""
        return replace(
            self,
            mask=self.mask.at[slot].set(False),
            pos=self.pos.at[slot].set(0),
        )

