"""Classic CF baselines: MF, LightGCN, NGCF.

Behavior contract: ``MICRO/codes/Models.py:163-243`` (standalone modules) and
the CF branches inside LATTICE/MICRO (``LATTICE/codes/Models.py:106-138``).
All three operate on the joint (n_users + n_items) node set with a normalized
joint adjacency (``create_adj_mat``, MICRO/codes/utility/load_data.py:105-150).

TPU design: the joint adjacency is a padded-COO :class:`SparseGraph`; each
propagation is one SpMM; the whole forward is jittable and differentiable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mmssl_tpu.config import ModelConfig
from mmssl_tpu.models.common import (
    dropout,
    init_linear,
    l2_normalize,
    leaky_relu,
    linear,
    xavier_uniform,
)
from mmssl_tpu.ops.sparse import SparseGraph


class CFOutput(NamedTuple):
    user_emb: jnp.ndarray  # [n_users, d]
    item_emb: jnp.ndarray  # [n_items, d]


def init_mf(key: jax.Array, n_users: int, n_items: int, cfg: ModelConfig) -> dict:
    ku, ki = jax.random.split(key)
    d = cfg.embed_size
    return {
        "user_emb": xavier_uniform(ku, (n_users, d)),
        "item_emb": xavier_uniform(ki, (n_items, d)),
    }


def apply_mf(params: dict, *_args, **_kw) -> CFOutput:
    """MF: raw embedding tables (MICRO/codes/Models.py:174-175)."""
    return CFOutput(params["user_emb"], params["item_emb"])


def init_lightgcn(key: jax.Array, n_users: int, n_items: int, cfg: ModelConfig) -> dict:
    return init_mf(key, n_users, n_items, cfg)


def lightgcn_propagate(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    joint_adj: SparseGraph,
    n_layers: int,
) -> CFOutput:
    """Mean over the layer stack of repeated joint-adjacency SpMMs
    (MICRO/codes/Models.py:233-243)."""
    n_users = user_emb.shape[0]
    ego = jnp.concatenate([user_emb, item_emb], axis=0)
    acc = ego
    h = ego
    for _ in range(n_layers):
        h = joint_adj.spmm(h)
        acc = acc + h
    mean = acc / (n_layers + 1)
    return CFOutput(mean[:n_users], mean[n_users:])


def apply_lightgcn(params: dict, joint: SparseGraph, cfg: ModelConfig) -> CFOutput:
    return lightgcn_propagate(params["user_emb"], params["item_emb"], joint, cfg.n_ui_layers)


def init_ngcf(key: jax.Array, n_users: int, n_items: int, cfg: ModelConfig) -> dict:
    keys = jax.random.split(key, 2 + 2 * cfg.n_ui_layers)
    d = cfg.embed_size
    params = {
        "user_emb": xavier_uniform(keys[0], (n_users, d)),
        "item_emb": xavier_uniform(keys[1], (n_items, d)),
        "gc": [],
        "bi": [],
    }
    # weight_size = [d] + [d]*n_layers (reference weight_size handling).
    for i in range(cfg.n_ui_layers):
        params["gc"].append(init_linear(keys[2 + 2 * i], d, d))
        params["bi"].append(init_linear(keys[3 + 2 * i], d, d))
    return params


def resolve_node_real(
    params: dict, n_users_real: Optional[int], n_items_real: Optional[int]
) -> Optional[Tuple[int, int]]:
    """(real user count, real item count) when EITHER catalog axis is
    geometry-padded (parallel/spmd.py), else None.  A side that is not
    padded has its real count equal to the table's row count."""
    if n_users_real is None and n_items_real is None:
        return None
    nu = n_users_real if n_users_real is not None else params["user_emb"].shape[0]
    ni = n_items_real if n_items_real is not None else params["item_emb"].shape[0]
    return (nu, ni)


def _node_dropout(
    sub: jax.Array,
    ego: jnp.ndarray,
    rate: float,
    n_users_pad: int,
    n_real: Optional[Tuple[int, int]],
) -> jnp.ndarray:
    """mess_dropout over the joint [n_users + n_items, d] node axis.

    With geometry-padded tables the mask is drawn at the REAL node dims and
    scattered into the padded layout (mirroring gumbel_soften_rows,
    steps_mmssl.py), so the PRNG stream — and hence the trajectory — is
    bit-identical to the unpadded run at ANY dropout rate (VERDICT r3 #6;
    previously equality held only at rate 0).  Pad rows keep mask True:
    their values are never read by a real row (pad graph columns are empty
    and every reduction is row-wise)."""
    if n_real is None:
        return dropout(sub, ego, rate, True)
    nu_r, ni_r = n_real
    keep = 1.0 - rate
    mask = jax.random.bernoulli(sub, keep, (nu_r + ni_r, ego.shape[1]))
    full = jnp.ones((ego.shape[0], ego.shape[1]), jnp.bool_)
    full = full.at[:nu_r].set(mask[:nu_r])
    full = full.at[n_users_pad : n_users_pad + ni_r].set(mask[nu_r:])
    return jnp.where(full, ego / keep, 0.0)


def ngcf_propagate(
    params: dict,
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    joint_adj: SparseGraph,
    mess_dropout: Sequence[float],
    train: bool,
    rng: Optional[jax.Array],
    concat_layers: bool,
    n_real: Optional[Tuple[int, int]] = None,
) -> CFOutput:
    """NGCF propagation (MICRO/codes/Models.py:203-218).

    ``concat_layers=True`` matches the standalone NGCF module (cat over
    layers); LATTICE/MICRO's ngcf CF-branch instead means over the stack
    (LATTICE/codes/Models.py:106-124) -> pass False.  ``n_real``: real
    (user, item) counts under geometry padding (see _node_dropout).
    """
    n_users = user_emb.shape[0]
    ego = jnp.concatenate([user_emb, item_emb], axis=0)
    outs = [ego]
    for i in range(len(params["gc"])):
        side = joint_adj.spmm(ego)
        summed = leaky_relu(linear(params["gc"][i], side), 0.01)
        bi = leaky_relu(linear(params["bi"][i], ego * side), 0.01)
        ego = summed + bi
        if train and rng is not None and i < len(mess_dropout):
            rng, sub = jax.random.split(rng)
            if mess_dropout[i] > 0:
                ego = _node_dropout(sub, ego, mess_dropout[i], n_users, n_real)
        outs.append(l2_normalize(ego, axis=1))
    if concat_layers:
        all_emb = jnp.concatenate(outs, axis=1)
    else:
        all_emb = jnp.mean(jnp.stack(outs, axis=1), axis=1)
    return CFOutput(all_emb[:n_users], all_emb[n_users:])


def apply_ngcf(
    params: dict,
    joint: SparseGraph,
    cfg: ModelConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    n_real: Optional[Tuple[int, int]] = None,
) -> CFOutput:
    return ngcf_propagate(
        params,
        params["user_emb"],
        params["item_emb"],
        joint,
        cfg.mess_dropout,
        train,
        rng,
        concat_layers=True,
        n_real=n_real,
    )


def cf_branch(
    params: dict,
    joint: SparseGraph,
    cfg: ModelConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    n_real: Optional[Tuple[int, int]] = None,
) -> CFOutput:
    """The CF branch shared by LATTICE/MICRO (LATTICE/codes/Models.py:106-138):
    cf_model selects lightgcn (mean stack) / ngcf (normalized mean stack) /
    mf (raw tables) over the shared embedding tables in ``params``."""
    if cfg.cf_model == "lightgcn":
        return lightgcn_propagate(params["user_emb"], params["item_emb"], joint, cfg.n_ui_layers)
    if cfg.cf_model == "ngcf":
        return ngcf_propagate(
            params,
            params["user_emb"],
            params["item_emb"],
            joint,
            cfg.mess_dropout,
            train,
            rng,
            concat_layers=False,
            n_real=n_real,
        )
    if cfg.cf_model == "mf":
        return CFOutput(params["user_emb"], params["item_emb"])
    raise ValueError(f"unknown cf_model {cfg.cf_model}")
