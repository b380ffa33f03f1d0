"""Device-mesh construction and canonical shardings.

Axis conventions for the whole framework:

* ``data``  — the batch axis of ``[N, H, W]`` image stacks (slices of a
  series, files of a directory, candidate plans of a tuning sweep).
* ``space`` — row blocks of a single slice, used only when one slice does
  not fit (or saturate) a chip; stencil ops exchange halos over ICI.

Within a pod slice the two axes ride ICI; across hosts JAX's distributed
initialisation puts ``data`` on DCN, which is the right layout because the
``data`` axis needs no collectives at all (SURVEY.md §2.9: every metric
reduction is per-image) while ``space`` needs latency-bound halo exchanges.
"""

from __future__ import annotations

import math
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_space: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, space)`` mesh.

    With defaults, all visible devices go on the ``data`` axis.  ``n_space``
    splits off a spatial axis for row-block sharding of very large slices;
    ``n_data × n_space`` must not exceed the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(len(devices) // n_space, 1)
    need = n_data * n_space
    if need > len(devices):
        raise ValueError(
            f"mesh {n_data}×{n_space} needs {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, axis_names=("data", "space"))


def make_mesh2d(
    n_data: int | None = None,
    n_sy: int = 1,
    n_sx: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, sy, sx)`` mesh for 2-D tile sharding
    (:mod:`mdx.parallel.spatial2d`): ``sy`` shards slice rows, ``sx``
    shards slice columns.  ``n_data × n_sy × n_sx`` must not exceed the
    device count; with ``n_data=None`` the remainder goes to ``data``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(len(devices) // (n_sy * n_sx), 1)
    need = n_data * n_sy * n_sx
    if need > len(devices):
        raise ValueError(
            f"mesh {n_data}×{n_sy}×{n_sx} needs {need} devices, "
            f"have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_sy, n_sx)
    return Mesh(grid, axis_names=("data", "sy", "sx"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """[N, H, W] sharded on N over ``data``, replicated over ``space``."""
    return NamedSharding(mesh, P("data", None, None))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[N, H, W] sharded on N over ``data`` and on H (row blocks) over
    ``space`` — the hybrid layout for big-slice series."""
    return NamedSharding(mesh, P("data", "space", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def divisible_batch(n: int, mesh: Mesh) -> int:
    """Smallest multiple of the ``data`` axis size ≥ n (padding target)."""
    d = mesh.shape["data"]
    return int(math.ceil(n / d) * d)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` with env-var
    defaults (SURVEY.md §2.9: DCN across hosts, ICI within a slice).

    On single-host deployments this is a no-op; on a multi-host TPU pod
    call it once per process before building meshes — ``jax.devices()``
    then spans all hosts and :func:`make_mesh` lays the ``data`` axis
    across DCN (no collectives needed there) and ``space`` across ICI.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("MDX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("MDX_COORDINATOR", None),
        num_processes=num_processes,
        process_id=(process_id if process_id is not None
                    else int(os.environ.get("MDX_PROCESS_ID", "0"))))
