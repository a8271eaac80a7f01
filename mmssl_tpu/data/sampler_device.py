"""On-device negative sampler.

Same sampling contract as the host :class:`NegativeSampler`
(``MMSSL/utility/load_data.py:153-191``): batch_size users drawn uniformly
from the users that have train items (without replacement when the batch fits,
else with replacement), one positive uniform over each user's train items, one
negative uniform over the complement of the user's train items.

The reference's rejection loop draws uniformly over the catalog until the
candidate is not a train item — the stationary distribution is exactly uniform
over the complement, which we produce directly (and data-independently, so it
jits) by drawing iid uniforms over the catalog, masking the user's train items
to -1, and taking the argmax: the argmax of iid uniforms restricted to an
index set is uniform on that set.

Keeping sampling on device lets a whole epoch of train steps run as ONE
``lax.scan`` dispatch with zero per-step host traffic (see
``steps_mmssl.mmssl_train_epoch``) — on a relay-attached TPU each host
roundtrip costs ~40 ms, more than half the cost of an MMSSL train step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mmssl_tpu.data.dataset import RecDataset


class DeviceSamplerConsts(NamedTuple):
    """Device-resident tables driving the sampler (all int32)."""

    exist_users: jnp.ndarray  # [n_exist] users with >=1 train item
    train_pad: jnp.ndarray  # [n_users, max_deg] item ids, -1 pad
    train_cnt: jnp.ndarray  # [n_users] true degree


def make_device_sampler_consts(dataset: RecDataset) -> DeviceSamplerConsts:
    import numpy as np

    train_pad, train_cnt = dataset.padded_split("train")
    return DeviceSamplerConsts(
        exist_users=jnp.asarray(np.asarray(dataset.exist_users, dtype=np.int32)),
        train_pad=jnp.asarray(train_pad.astype(np.int32)),
        train_cnt=jnp.asarray(train_cnt.astype(np.int32)),
    )


def device_sample(
    rng: jax.Array,
    consts: DeviceSamplerConsts,
    n_items: int,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw one (users, pos, neg) training batch entirely on device."""
    r_u, r_p, r_n = jax.random.split(rng, 3)
    n_exist = consts.exist_users.shape[0]

    if batch_size <= n_exist:
        # Uniform without replacement (load_data.py:156: rd.sample).
        perm = jax.random.permutation(r_u, n_exist)[:batch_size]
        users = consts.exist_users[perm]
    else:
        idx = jax.random.randint(r_u, (batch_size,), 0, n_exist)
        users = consts.exist_users[idx]

    # Positive: uniform slot in the user's padded train row. uniform() < 1
    # strictly, so slot in [0, cnt-1]; exist_users guarantees cnt >= 1.
    cnt = consts.train_cnt[users]
    slot = (jax.random.uniform(r_p, (batch_size,)) * cnt.astype(jnp.float32)).astype(jnp.int32)
    pos = consts.train_pad[users, slot]

    # Negative: uniform over the complement of the user's train items.
    rows = consts.train_pad[users]  # [B, max_deg]
    z = jax.random.uniform(r_n, (batch_size, n_items))
    safe = jnp.where(rows < 0, n_items, rows)  # pads scatter out of bounds
    z = z.at[jnp.arange(batch_size)[:, None], safe].set(-1.0, mode="drop")
    neg = jnp.argmax(z, axis=1).astype(jnp.int32)
    return users.astype(jnp.int32), pos.astype(jnp.int32), neg
