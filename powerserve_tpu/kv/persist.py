"""Persistent KV prefix save/load.

The reference's only runtime "checkpoint": a system-prompt KV dumped at
conversion time and preloaded into the NPU cache at startup, with
reset truncating back to that prefix instead of zero (reference
graph_interface.cpp:218-260, causal_models.cpp:166,259-261). Here a
prefix is any slot's first `pos` tokens, serialized to .npz and loadable
into any compatible cache."""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from .cache import KVCache


def save_prefix(kv: KVCache, path: str | os.PathLike, slot: int = 0,
                length: int | None = None) -> int:
    """Write slot's first `length` (default: pos) tokens of KV to disk."""
    n = int(np.asarray(kv.pos)[slot]) if length is None else int(length)
    data = {
        "k": np.asarray(kv.k[:, slot, :, :n]),
        "v": np.asarray(kv.v[:, slot, :, :n]),
        "quantized": np.asarray(kv.quantized),
        "n": np.asarray(n),
    }
    if kv.quantized:
        data["k_scale"] = np.asarray(kv.k_scale[:, slot, :, :n])
        data["v_scale"] = np.asarray(kv.v_scale[:, slot, :, :n])
    np.savez_compressed(path, **data)
    return n


def load_prefix(kv: KVCache, path: str | os.PathLike,
                slot: int = 0) -> tuple[KVCache, int]:
    """Load a saved prefix into a slot; returns (kv, prefix_len).

    The slot's pos/mask are set to the prefix (equivalent of the
    reference's advance_tokens(kv_size) after load_kv)."""
    z = np.load(path)
    n = int(z["n"])
    if bool(z["quantized"]) != kv.quantized:
        raise ValueError("KV quantization mode mismatch")
    # saved prefix is [L, H, n, D]; cache is [L, S, H, T, D]
    if (z["k"].shape[0] != kv.n_layers
            or z["k"].shape[1] != kv.k.shape[2]
            or z["k"].shape[3:] != kv.k.shape[4:]):
        raise ValueError(f"KV shape mismatch: {z['k'].shape} vs cache "
                         f"{kv.k.shape}")
    if n > kv.max_seq:
        raise ValueError(f"prefix ({n}) exceeds cache ({kv.max_seq})")
    kv = dataclasses.replace(
        kv,
        k=kv.k.at[:, slot, :, :n].set(jnp.asarray(z["k"])),
        v=kv.v.at[:, slot, :, :n].set(jnp.asarray(z["v"])),
    )
    if kv.quantized:
        kv = dataclasses.replace(
            kv,
            k_scale=kv.k_scale.at[:, slot, :, :n].set(
                jnp.asarray(z["k_scale"])),
            v_scale=kv.v_scale.at[:, slot, :, :n].set(
                jnp.asarray(z["v_scale"])),
        )
    mask = kv.mask.at[slot].set(False)
    mask = mask.at[slot, :n].set(True)
    return dataclasses.replace(
        kv, mask=mask, pos=kv.pos.at[slot].set(n)), n
