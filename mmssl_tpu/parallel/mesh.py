"""Device mesh construction and partition-spec policy.

Net-new TPU design (the reference is single-GPU with no parallelism of any
kind, SURVEY.md §2.4-2.5).  Strategy:

  - axis "data": batch dimension of the train step (DP); gradient reduction
    and BatchNorm statistics become XLA all-reduces inserted by the SPMD
    partitioner.
  - axis "model": the catalog/feature axis — embedding-table rows, modality
    feature rows, discriminator layer-1 rows, and the n_items dimension of
    every full-catalog score matrix (the long-axis analog of sequence
    parallelism in this workload, SURVEY.md §5.7).

Multi-host: ``jax.distributed.initialize()`` then the same mesh over all
devices; DCN traffic stays on the leading (data) axis by construction of
``create_device_mesh``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    mesh_shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    Default layout: all devices on the data axis for small catalogs; pass
    ``mesh_shape=(d, m)`` to split.  A 1-element model axis keeps every
    sharding spec valid on a single chip.
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if mesh_shape is None:
        # Favor a square-ish split so both batch and catalog scale.
        m = 1
        for cand in (4, 2):
            if n % cand == 0 and n >= cand * 2:
                m = cand
                break
        mesh_shape = (n // m, m)
    arr = np.asarray(devs).reshape(mesh_shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def rows_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded 2D table over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))
