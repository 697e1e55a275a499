"""Device mesh + sharding: the TPU-native replacement for the reference's
NCCL/DDP machinery (/root/reference/improved_diffusion/dist_util.py).

The reference is data-parallel only (SURVEY.md §2.4): DDP gradient allreduce,
rank-0 broadcast of params, per-rank dataset sharding. Here:

* ``jax.distributed.initialize()`` per host (SLURM/torchrun-style env vars
  handled by JAX itself);
* a Mesh with axes ('data', 'model') — 'model' defaults to 1 and is headroom
  for tensor-parallel attention/conv sharding on larger configs;
* params replicated, batch sharded over 'data'; XLA inserts the gradient
  psum over ICI — there is no user-visible collective code;
* logging/checkpoint gathers use multihost utils (cold path).
"""

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def setup_distributed():
    """Initialize multi-host JAX if a coordinator is configured; no-op
    single-host. Safe to call multiple times."""
    global _initialized
    if _initialized:
        return
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or (
        os.environ.get("SLURM_NTASKS") and int(os.environ["SLURM_NTASKS"]) > 1
    ):
        jax.distributed.initialize()
    _initialized = True


def make_mesh(num_data: Optional[int] = None, num_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model == n, (num_data, num_model, n)
    dev_array = np.array(devices).reshape(num_data, num_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays onto the mesh, batch-sharded."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()
