"""Multi-host batch assembly.

On a pod slice each process samples its slice of the global batch with its
own host sampler (disjoint RNG streams via process-index folding) and the
global device array is assembled with
``jax.make_array_from_process_local_data`` — no host ever materializes the
whole batch.  Single-process runs degenerate to plain device_put.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmssl_tpu.data.sampler import NegativeSampler
from mmssl_tpu.parallel.mesh import DATA_AXIS


class GlobalBatchLoader:
    """Samples per-process shards of the global batch.

    global_batch_size must divide by process_count; each process's sampler
    draws an independent stream (seed folded with process_index).
    """

    def __init__(self, sampler: NegativeSampler, mesh: Mesh, global_batch_size: int, seed: int = 0):
        self.sampler = sampler
        self.mesh = mesh
        self.global_batch = global_batch_size
        n_proc = jax.process_count()
        assert global_batch_size % n_proc == 0, "batch must divide process count"
        self.local_batch = global_batch_size // n_proc
        self._rng = np.random.default_rng((seed, jax.process_index()))
        self._sharding = NamedSharding(mesh, P(DATA_AXIS))

    def _globalize(self, local: np.ndarray) -> jax.Array:
        return jax.make_array_from_process_local_data(
            self._sharding, local, (self.global_batch,)
        )

    def next(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        # Local sampler draws local_batch users (with replacement iff the
        # local batch exceeds the catalog, mirroring Data.sample).
        saved = self.sampler.batch_size
        self.sampler.batch_size = self.local_batch
        try:
            users, pos, neg = self.sampler.sample(self._rng)
        finally:
            self.sampler.batch_size = saved
        return self._globalize(users), self._globalize(pos), self._globalize(neg)
