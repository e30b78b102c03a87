"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's three torch.distributed/NCCL init paths (semseg setup_ddp,
detectron2 launch(), detrex slurm init; SURVEY.md §2.6).

One explicit ``jax.sharding.Mesh`` expresses every parallelism axis:
  * ``data``  — batch sharding (≙ DDP).  Gradients are reduced by XLA's
    automatic collectives inside pjit; no GradScaler/NCCL plumbing.
  * ``space`` — optional spatial sharding for very large images (halo
    exchange for shifted windows rides ICI).

Multi-host: call ``jax.distributed.initialize()`` once at program start
(coordinator address via env), then these helpers operate on the global
device set transparently.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> bool:
    """Multi-host initialization (replaces the reference's three NCCL init
    paths: semseg setup_ddp SLURM/env://, d2 launch(), detrex slurm init).

    Reads standard env: COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID —
    with SLURM fallbacks (SLURM_PROCID/SLURM_NTASKS like the reference's
    utils.py:55-76).  Returns True if multi-host was initialized; single
    host is a no-op (world-size-1 short-circuit, same contract as d2
    comm.py).
    """
    import os

    coord = os.environ.get("COORDINATOR_ADDRESS")
    n = os.environ.get("NUM_PROCESSES") or os.environ.get("SLURM_NTASKS")
    pid = os.environ.get("PROCESS_ID") or os.environ.get("SLURM_PROCID")
    if not coord or not n or int(n) <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(n),
        process_id=int(pid or 0),
    )
    return True


def make_mesh(
    data: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, space) mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // space
    assert data * space == n, f"mesh {data}x{space} != {n} devices"
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in the pytree with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
