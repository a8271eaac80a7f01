"""SPMD-sharded train/eval programs.

The single-device step functions (train/steps_*.py) are pure; this module
assigns NamedShardings to their inputs/outputs and jits them over a mesh,
letting the XLA SPMD partitioner insert the collectives (psum for DP grads
and BatchNorm stats, all-gathers for embedding-row exchange around gathers,
reduce-scatters where profitable) — the "annotate shardings, let XLA place
collectives" recipe.

Sharding policy (mesh axes from parallel.mesh):
  - embedding tables / modality features / D layer-1+2 weights: row-sharded
    over "model" (these are the only multi-hundred-MB tensors at Sports
    scale: visual feats 280 MB, D l1 337 MB)
  - optimizer moments: follow their parameters
  - batch index arrays: sharded over "data"
  - SparseGraph COO buffers and small weights: replicated
  - [B, n_items] score/sim matrices (created inside the step): the
    partitioner propagates (data, model) from the operands
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmssl_tpu.config import ExperimentConfig
from mmssl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from mmssl_tpu.train.steps_mmssl import (
    MMSSLConsts,
    MMSSLTrainState,
    mmssl_train_epoch_impl,
    mmssl_train_step_impl,
)


_warned_replicated: set = set()


def _sharding_for_leaf(mesh: Mesh, path: Tuple, leaf: Any) -> NamedSharding:
    """Row-shard 2D tensors whose leading dim is a catalog axis; replicate
    the rest.  Path-based policy keyed on parameter names.

    Catalog tables always divide the model axis in production: the Trainer
    geometry-pads user/item row counts to mesh multiples at build time
    (Trainer._build_mmssl), so user_emb/item_emb/feats/l1/graph rows shard at
    ANY dataset scale.  A marked tensor that still fails divisibility (e.g.
    the discriminator's l2, whose row count n_items//4 is not padded — 42 MB
    at Sports scale, cheap to replicate) falls back to replication with a
    one-time warning instead of silently degrading."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    ndim = getattr(leaf, "ndim", 0)
    model_size = mesh.shape[MODEL_AXIS]

    def rows_divisible() -> bool:
        return ndim >= 2 and leaf.shape[0] % model_size == 0

    # "ui"/"iu" cover DenseGraph.mat leaves (paths like "ui/0",
    # "mod_ui/image/0"): [n_users|n_items, n_cols] adjacencies row-sharded
    # over the catalog axis.  SparseGraph COO leaves under the same paths are
    # 1-D and fall through to replication.
    # "joint" covers BipartiteJointGraph's dense R/R^T blocks; "item_state" /
    # "original_adjs" cover LATTICE/MICRO's [n_items, n_items] learned and
    # kNN item graphs (their SparseGraph variants have 1-D leaves and fall
    # through to replication).
    row_sharded_markers = (
        "user_emb", "item_emb", "feats", "train_pad", "ui", "iu",
        "joint", "item_state", "original_adjs",
    )
    # Discriminator tower: l1 [n_items, n/4] and l2 [n/4, n/8] row-sharded
    # (the row dim is the contraction dim of their matmuls, so the local
    # partial products reduce with one psum each).
    marked = any(m in joined for m in row_sharded_markers) or (
        "l1/w" in joined or "l2/w" in joined
    )
    if marked and rows_divisible():
        return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (ndim - 1))))
    if marked and ndim >= 2 and model_size > 1 and joined not in _warned_replicated:
        _warned_replicated.add(joined)
        import logging

        logging.getLogger("mmssl_tpu.spmd").warning(
            "replicating %s (shape %s): rows %% model axis (%d) != 0",
            joined, tuple(leaf.shape), model_size,
        )
    return NamedSharding(mesh, P())


def tree_shardings(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _sharding_for_leaf(mesh, path, leaf), tree
    )


def global_device_put(tree: Any, shardings: Any) -> Any:
    """device_put that also works when the mesh spans multiple PROCESSES.

    Single-process: plain jax.device_put.  Multi-process: a NamedSharding
    over all hosts' devices is not addressable from any one process, so
    host-resident leaves are globalized with ``jax.make_array_from_callback``
    — every process holds the identical host value by construction (params,
    consts, and sampler tables are seed-/dataset-derived, never
    process-dependent), so each process materializes exactly its addressable
    shards.  Typed PRNG keys are unwrapped to key data and re-wrapped (the
    raw-data path mirrors train/checkpoint.py).  Leaves that are already
    global jax.Arrays reshard via device_put (supported cross-process)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(leaf: Any, sh: NamedSharding) -> Any:
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return jax.device_put(leaf, sh)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(leaf))
            impl = jax.random.key_impl(leaf)
            garr = jax.make_array_from_callback(data.shape, sh, lambda idx: data[idx])
            return jax.random.wrap_key_data(garr, impl=impl)
        host = np.asarray(leaf)
        return jax.make_array_from_callback(host.shape, sh, lambda idx: host[idx])

    return jax.tree.map(put, tree, shardings)


def shard_tree(mesh: Mesh, tree: Any) -> Any:
    """device_put a pytree according to the sharding policy."""
    return global_device_put(tree, tree_shardings(mesh, tree))


def make_sharded_mmssl_step(
    mesh: Mesh,
    cfg: ExperimentConfig,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    n_users: int,
    n_items: int,
    state: MMSSLTrainState,
    consts: MMSSLConsts,
    use_init_static: "bool | None" = None,
):
    """Returns (step_fn, sharded_state, sharded_consts).

    step_fn(state, consts, users, pos, neg, do_rebuild) -> (state, metrics),
    compiled once over the mesh with stable state shardings (outputs pinned
    to inputs so the training loop never reshards).  ``use_init_static=False``
    compiles out the pre-first-rebuild lax.cond (see steps_mmssl); the
    trainer switches to that variant once the rebuild happened.
    """
    state_sh = tree_shardings(mesh, state)
    consts_sh = tree_shardings(mesh, consts)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    scalar_sh = NamedSharding(mesh, P())
    metrics_sh = scalar_sh  # packed [len(MMSSL_METRIC_KEYS)] vector, replicated

    step = jax.jit(
        partial(
            mmssl_train_step_impl,
            cfg=cfg,
            g_opt=g_opt,
            d_opt=d_opt,
            n_users=n_users,
            n_items=n_items,
            use_init_static=use_init_static,
        ),
        in_shardings=(state_sh, consts_sh, batch_sh, batch_sh, batch_sh, scalar_sh),
        out_shardings=(state_sh, metrics_sh),
        donate_argnums=(0,),
    )
    return step, global_device_put(state, state_sh), global_device_put(consts, consts_sh)


def make_sharded_mmssl_epoch(
    mesh: Mesh,
    cfg: ExperimentConfig,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    n_users: int,
    n_items: int,
    state: MMSSLTrainState,
    consts: MMSSLConsts,
    sampler_consts,
):
    """Fused-chunk variant of the sharded step: ``n_steps`` train steps as
    one scanned device program with on-device sampling (zero per-step host
    traffic — see steps_mmssl.mmssl_train_epoch).  State shardings match
    make_sharded_mmssl_step so the two programs interoperate on the same
    buffers.  Returns (epoch_fn, sharded_sampler_consts);
    epoch_fn(state, consts, sampler, start_idx, n_steps, use_init_static)
    — the last two args are static (jit caches one program per variant).
    """
    state_sh = tree_shardings(mesh, state)
    consts_sh = tree_shardings(mesh, consts)
    # Sampler tables are small (int32, n_users x max_deg); replicate so the
    # scan's gathers stay local.
    sampler_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), sampler_consts)
    scalar_sh = NamedSharding(mesh, P())

    epoch = jax.jit(
        partial(
            mmssl_train_epoch_impl,
            cfg=cfg,
            g_opt=g_opt,
            d_opt=d_opt,
            n_users=n_users,
            n_items=n_items,
        ),
        # n_steps + use_init_static (pjit forbids kwargs with in_shardings)
        static_argnums=(4, 5),
        in_shardings=(state_sh, consts_sh, sampler_sh, scalar_sh),
        out_shardings=(state_sh, scalar_sh),
        donate_argnums=(0,),
    )
    return epoch, global_device_put(sampler_consts, sampler_sh)


def make_sharded_simple_step(
    mesh: Mesh,
    cfg: ExperimentConfig,
    opt: optax.GradientTransformation,
    state,
    consts,
    sparse: bool = True,
    n_items_real: "int | None" = None,
    n_users_real: "int | None" = None,
):
    """SPMD variants of the single-optimizer train step (LATTICE/MICRO/CF
    baselines, train/steps_simple.py), mirroring make_sharded_mmssl_step.
    ``n_items_real``/``n_users_real``: set when the Trainer geometry-padded
    the catalog axes.

    Returns (step_build, step_nobuild, sharded_state, sharded_consts): the
    two compiled programs per model (build_item_graph is a compile-time
    branch — the build variant carries the n_items^2 kNN + top-k, which is
    exactly the tensor that wants the catalog axis).  Tables/feats/joint
    blocks/item graphs shard per tree_shardings; batch arrays ride the data
    axis; XLA places the psums/all-gathers."""
    from mmssl_tpu.train.steps_simple import simple_train_step_impl

    state_sh = tree_shardings(mesh, state)
    consts_sh = tree_shardings(mesh, consts)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    metrics_sh = NamedSharding(mesh, P())

    def make(build: bool):
        return jax.jit(
            partial(
                simple_train_step_impl,
                cfg=cfg, opt=opt, build_item_graph=build, sparse=sparse,
                n_items_real=n_items_real, n_users_real=n_users_real,
            ),
            in_shardings=(state_sh, consts_sh, batch_sh, batch_sh, batch_sh),
            out_shardings=(state_sh, metrics_sh),
            donate_argnums=(0,),
        )

    return (
        make(True), make(False),
        global_device_put(state, state_sh), global_device_put(consts, consts_sh),
    )


def make_sharded_simple_epoch(
    mesh: Mesh,
    cfg: ExperimentConfig,
    opt: optax.GradientTransformation,
    state,
    consts,
    sampler_consts,
    n_items: int,
    sparse: bool = True,
    n_items_real: "int | None" = None,
    n_users_real: "int | None" = None,
):
    """Fused-chunk SPMD variant of the simple-model epoch scan (on-device
    sampling, no per-step host traffic), sharded identically to
    make_sharded_simple_step so both programs run on the same buffers.
    Returns (epoch_fn, sharded_sampler_consts); epoch_fn(state, consts,
    sampler, n_steps) with n_steps static."""
    from mmssl_tpu.train.steps_simple import simple_train_epoch_impl

    state_sh = tree_shardings(mesh, state)
    consts_sh = tree_shardings(mesh, consts)
    sampler_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), sampler_consts)
    metrics_sh = NamedSharding(mesh, P())

    epoch = jax.jit(
        partial(
            simple_train_epoch_impl,
            n_items=n_items, cfg=cfg, opt=opt, sparse=sparse,
            n_items_real=n_items_real, n_users_real=n_users_real,
        ),
        static_argnums=(3,),  # n_steps
        in_shardings=(state_sh, consts_sh, sampler_sh),
        out_shardings=(state_sh, metrics_sh),
        donate_argnums=(0,),
    )
    return epoch, global_device_put(sampler_consts, sampler_sh)


def sharded_eval_scores(mesh: Mesh):
    """Factory for a catalog-sharded scoring + top-k program.

    u_emb replicated rows (gathered per batch), i_emb row-sharded over
    "model"; the [B, n_items] score matrix is sharded (data, model) and
    lax.top_k runs after the partitioner's gather of the item axis.
    """

    @partial(jax.jit, static_argnames=("k",))
    def score_topk(u_rows: jnp.ndarray, i_emb: jnp.ndarray, mask_add: jnp.ndarray, k: int):
        scores = u_rows @ i_emb.T + mask_add
        scores = jax.lax.with_sharding_constraint(
            scores, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
        )
        return jax.lax.top_k(scores, k)

    return score_topk
