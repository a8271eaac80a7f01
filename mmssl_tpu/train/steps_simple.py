"""Single-optimizer train steps for LATTICE / MICRO / CF baselines.

Reference loop: ``LATTICE/codes/main.py:62-162`` / ``MICRO/codes/main.py:
66-166``: per batch, forward over the joint normalized adjacency with
``build_item_graph`` true only on the first batch of each epoch, BPR loss
(+ MICRO: InfoNCE(modality_item, fused) * loss_ratio over the full item set),
single Adam step; LR decayed per epoch (handled by the optimizer schedule).

``build_item_graph`` is a *static* argument: the build variant compiles the
n_items^2 similarity + top-k into the step, the common variant reuses the
carried adjacency state.  Two programs total per model, both device-only.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax

from mmssl_tpu.config import ExperimentConfig
from mmssl_tpu.losses.bpr import bpr_loss
from mmssl_tpu.losses.contrastive import infonce
from mmssl_tpu.models.cf import (
    CFOutput,
    apply_lightgcn,
    apply_mf,
    apply_ngcf,
    resolve_node_real,
)
from mmssl_tpu.models.common import resolve_dtype
from mmssl_tpu.models.lattice import apply_lattice
from mmssl_tpu.models.micro import ModalityAdj, apply_micro
from mmssl_tpu.ops.sparse import SparseGraph


SIMPLE_METRIC_KEYS = ("loss", "mf_loss", "emb_loss", "cl_loss")


class SimpleTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    # Carried item-graph state: LATTICE -> dense [n_items, n_items];
    # MICRO -> dict of per-modality adjacencies; CF baselines -> unused ().
    item_state: Union[jnp.ndarray, Dict[str, ModalityAdj], Tuple]
    rng: jax.Array
    step: jnp.ndarray


class SimpleConsts(NamedTuple):
    feats: Dict[str, jnp.ndarray]
    joint: SparseGraph  # normalized joint adjacency D^-1 (A+I)
    original_adjs: Dict[str, ModalityAdj]  # static modality graphs (LATTICE/MICRO)


def simple_train_step_impl(
    state: SimpleTrainState,
    consts: SimpleConsts,
    users: jnp.ndarray,
    pos: jnp.ndarray,
    neg: jnp.ndarray,
    cfg: ExperimentConfig,
    opt: optax.GradientTransformation,
    build_item_graph: bool,
    sparse: bool = True,
    n_items_real: "int | None" = None,
    n_users_real: "int | None" = None,
) -> Tuple[SimpleTrainState, Dict[str, jnp.ndarray]]:
    # n_items_real / n_users_real: static; set by the Trainer when the
    # catalog tables are geometry-padded to mesh multiples (parallel/
    # spmd.py) — the kNN builds and MICRO's full-catalog InfoNCE mask the
    # pad rows, and NGCF's mess_dropout masks are drawn at the REAL node
    # dims (models/cf._node_dropout), so numerics match the unpadded run
    # (models/lattice, models/micro, losses/contrastive docstrings).
    # None = unpadded fast path, byte-identical programs to before the
    # padding feature existed.
    t = cfg.train
    name = cfg.model.name
    rng, r_fwd = jax.random.split(state.rng)

    def loss_fn(params):
        new_item_state = state.item_state
        cl = jnp.zeros(())
        if name == "lattice":
            out = apply_lattice(
                params, consts.joint, consts.feats, consts.original_adjs,
                state.item_state, cfg.model, cfg.parity, build_item_graph,
                train=True, rng=r_fwd, n_items_real=n_items_real,
                n_users_real=n_users_real,
            )
            u_emb, i_emb = out.user_emb, out.item_emb
            new_item_state = out.item_adj
        elif name == "micro":
            out = apply_micro(
                params, consts.joint, consts.feats, consts.original_adjs,
                state.item_state, cfg.model, cfg.parity, build_item_graph,
                sparse=sparse, train=True, rng=r_fwd, n_items_real=n_items_real,
                n_users_real=n_users_real,
            )
            u_emb, i_emb = out.user_emb, out.item_emb
            new_item_state = out.mod_adjs
            # MICRO/codes/main.py:99-104: InfoNCE(modality_item, fused) per
            # modality over ALL items, weighted by loss_ratio; eps=0 variant.
            # checkpoint: the default VJP stores both [n_items, n_items] exp
            # matrices per call (~400 MB f32 each at Baby scale — measured
            # as the bulk of MICRO's 24 ms step); remat re-runs two thin
            # GEMMs instead.  dtype: bf16 GEMM inputs under compute_dtype.
            cdt = resolve_dtype(cfg.model.compute_dtype)
            # Static skip at loss_ratio == 0: the weight is a Python float,
            # so a zero weight removes the O(n_items^2) InfoNCE GEMMs from
            # the program entirely (the multiply-by-zero form still computes
            # and reduces both [n, n] similarity matrices — XLA does not DCE
            # through the remat barrier).  Also makes the
            # `train.loss_ratio=0` bench override a TRUE compute ablation
            # (docs/performance.md MICRO attribution).
            if t.loss_ratio != 0.0:
                base = lambda x, y: infonce(x, y, t.cl_tau, eps=0.0, dtype=cdt,
                                            n_real=n_items_real)
                nce = jax.checkpoint(base) if t.cl_remat else base
                if t.cl_batched:
                    # One batched call: the [M, c, N] GEMM family reads the
                    # shared fusion operand once per chunk; per-modality
                    # numerics are unchanged (vmap batches, not reorders).
                    xs = jnp.stack(
                        [out.mm_item_embeds[m] for m in sorted(consts.feats)]
                    )
                    cl = jnp.sum(jax.vmap(nce, in_axes=(0, None))(xs, out.fusion))
                else:
                    for m in sorted(consts.feats):
                        cl = cl + nce(out.mm_item_embeds[m], out.fusion)
                cl = cl * t.loss_ratio
        elif name == "lightgcn":
            res = apply_lightgcn(params, consts.joint, cfg.model)
            u_emb, i_emb = res.user_emb, res.item_emb
        elif name == "ngcf":
            res = apply_ngcf(
                params, consts.joint, cfg.model, train=True, rng=r_fwd,
                n_real=resolve_node_real(params, n_users_real, n_items_real),
            )
            u_emb, i_emb = res.user_emb, res.item_emb
        elif name == "mf":
            res = apply_mf(params)
            u_emb, i_emb = res.user_emb, res.item_emb
        else:
            raise ValueError(name)
        mf, emb, reg = bpr_loss(u_emb[users], i_emb[pos], i_emb[neg], t.decay)
        total = mf + emb + reg + cl
        aux = {"mf_loss": mf, "emb_loss": emb, "cl_loss": cl, "item_state": new_item_state}
        return total, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = SimpleTrainState(
        params=params,
        opt_state=opt_state,
        item_state=jax.lax.stop_gradient(aux["item_state"]),
        rng=rng,
        step=state.step + 1,
    )
    # Packed metric vector (SIMPLE_METRIC_KEYS order): one device buffer ->
    # one host transfer per fetch.
    metrics = jnp.stack([loss, aux["mf_loss"], aux["emb_loss"], aux["cl_loss"]])
    return new_state, metrics


simple_train_step = partial(
    jax.jit,
    static_argnames=("cfg", "opt", "build_item_graph", "sparse", "n_items_real",
                     "n_users_real"),
    donate_argnums=(0,),
)(simple_train_step_impl)


def simple_train_epoch_impl(
    state: SimpleTrainState,
    consts: SimpleConsts,
    sampler: "DeviceSamplerConsts",
    n_steps: int,
    n_items: int,
    cfg: ExperimentConfig,
    opt: optax.GradientTransformation,
    sparse: bool = True,
    n_items_real: "int | None" = None,
    n_users_real: "int | None" = None,
) -> Tuple[SimpleTrainState, jnp.ndarray]:
    """``n_steps`` non-building train steps as ONE device program.

    LATTICE/MICRO rebuild their learned item graph only on the first batch of
    an epoch (LATTICE/codes/main.py:77,84-85) — the Trainer runs that batch as
    a separate build_item_graph=True dispatch and scans the rest here with the
    carried item state.  Sampling is on device, so the whole chunk needs no
    per-step host traffic (one dispatch + one metrics fetch).
    """
    from mmssl_tpu.data.sampler_device import device_sample

    def body(carry: SimpleTrainState, _):
        rng, r_samp = jax.random.split(carry.rng)
        carry = carry._replace(rng=rng)
        users, pos, neg = device_sample(r_samp, sampler, n_items, cfg.data.batch_size)
        new_state, metrics = simple_train_step_impl(
            carry, consts, users, pos, neg, cfg, opt,
            build_item_graph=False, sparse=sparse, n_items_real=n_items_real,
            n_users_real=n_users_real,
        )
        return new_state, metrics

    state, metrics = jax.lax.scan(body, state, None, length=n_steps)
    return state, metrics


simple_train_epoch = partial(
    jax.jit,
    static_argnames=("n_steps", "n_items", "cfg", "opt", "sparse", "n_items_real",
                     "n_users_real"),
    donate_argnums=(0,),
)(simple_train_epoch_impl)
