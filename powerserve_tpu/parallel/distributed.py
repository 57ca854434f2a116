"""Multi-host initialization + mesh construction.

The scale-out role the reference doesn't have (SURVEY §2.3): multi-host
TPU slices coordinate through jax.distributed (DCN) while XLA
collectives ride ICI inside each slice. Layout recipe:

  - "tp" (tensor parallel) maps to intra-slice ICI — weight shards and
    their all-gather/reduce-scatter stay on the fast fabric
  - "dp" (data / slot parallel) maps across hosts over DCN — continuous
    batching shards request slots, and the only cross-host traffic is
    request routing (host-level), not activations

Usage on each host:
    init_distributed(coordinator, num_processes, process_id)
    mesh = make_multihost_mesh(tp=chips_per_host_slice)
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from ..core.logging import get_logger

log = get_logger("distributed")


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID;
    TPU pod environments auto-detect when all are None)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info(f"distributed: process {jax.process_index()}/"
             f"{jax.process_count()}, {jax.local_device_count()} local / "
             f"{jax.device_count()} global devices")


def make_multihost_mesh(tp: int | None = None, sp: int = 1) -> Mesh:
    """(dp, sp, tp) mesh over all global devices: tp within a host's
    chips (ICI), dp across hosts (DCN), optional sp (sequence parallel:
    KV time shards) between them — sp groups should also stay within a
    host so the per-token partial-softmax merges ride ICI. Defaults
    tp = local_device_count, sp = 1."""
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    tp = tp or n_local
    assert n_global % (tp * sp) == 0, \
        f"{n_global} devices not divisible by sp*tp={sp * tp}"
    dp = n_global // (tp * sp)
    # order devices host-major so sp/tp groups stay within a host
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))
