"""MMSSL adversarial training step — one compiled program per batch.

Reference flow (``MMSSL/main.py:333-434``, SURVEY.md §3.2) reproduced as a
single jit:

  1. no-grad generator forward (train mode, dropout live)
  2. full-catalog similarity sweeps (CF + per-modality) with train-interaction
     masking and row L2 norm (``u_sim_calculation``, main.py:283-298)
  3. discriminator step: fake = modality sims, real = Gumbel-softened
     interaction rows + scaled CF sim (main.py:349-352), WGAN loss with
     second-order gradient penalty (main.py:140-161), Adam update
  4. generator step against the *updated* discriminator: BPR + feat-reg +
     user-level InfoNCE + adversarial term, AdamW update
  5. adjacency densification: either accumulate per-user top-k of the modality
     sims into fixed-capacity COO buffers, or (every T-th batch) rebuild the
     per-modality graphs from the buffers on device and reset
     (main.py:378-405; the reference round-trips GPU->python lists->scipy->GPU
     here — we never leave HBM).  Quirk Q5 (T=1 makes rebuilds see empty
     buffers from idx>=2) falls out of the same cadence logic.

All shapes are static: densified graph/buffer capacity C = T * B * k (the
most entries a rebuild can see).  Until the first rebuild the modality-ID
propagation reads consts.ui/iu (state.use_init; the reference initializes
image/text_ui_graph to the normalized interaction graph, main.py:68-69), so
the carried graphs never need interaction-nnz capacity — at the default
m_topk_rate the post-rebuild graphs hold <=128 padded entries vs ~107k
interaction nnz, and the per-entry-latency-bound scatters shrink to match.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmssl_tpu.config import ExperimentConfig
from mmssl_tpu.losses.bpr import bpr_loss
from mmssl_tpu.losses.contrastive import infonce
from mmssl_tpu.losses.reg import feat_reg_loss
from mmssl_tpu.models.common import l2_normalize, linear, matmul, resolve_dtype
from mmssl_tpu.models.mmssl import (
    BipartiteGraphs,
    apply_discriminator,
    apply_mmssl,
    discriminator_tower,
    mmssl_combine,
    mmssl_deterministic_branch,
    mmssl_fused_forward,
    mmssl_modality_feats,
)
from mmssl_tpu.ops.sparse import SparseGraph, device_row_norm_inv_sqrt


MMSSL_METRIC_KEYS = ("loss", "loss_d", "mf_loss", "emb_loss", "feat_reg", "cl_loss", "g_lossf")


class MMSSLConsts(NamedTuple):
    """Per-run constants passed to every step (device-resident)."""

    feats: Dict[str, jnp.ndarray]  # modality -> [n_items, feat_dim]
    ui: object  # normalized u-i graph (SparseGraph | DenseGraph)
    iu: object
    train_pad: jnp.ndarray  # int32 [n_users, max_deg], -1 pad


class MMSSLTrainState(NamedTuple):
    params: dict
    d_params: dict
    opt_state: optax.OptState
    d_opt_state: optax.OptState
    mod_ui: Dict[str, object]  # densified graphs (SparseGraph cap C | DenseGraph)
    mod_iu: Dict[str, object]
    buf_rows: Dict[str, jnp.ndarray]  # int32 [C] accumulated user ids
    buf_cols: Dict[str, jnp.ndarray]  # int32 [C] accumulated item ids
    buf_count: Dict[str, jnp.ndarray]  # int32 scalar
    # True until the first densification rebuild: the modality-ID propagation
    # reads consts.ui/iu (the reference initializes image/text_ui_graph to
    # the normalized interaction graph, MMSSL/main.py:68-69) so mod_ui/mod_iu
    # can stay at T*B*k capacity.
    use_init: jnp.ndarray  # bool scalar
    rng: jax.Array
    step: jnp.ndarray  # int32


def densify_topk(cfg: ExperimentConfig, n_items: int) -> int:
    """k = int(n_items * m_topk_rate) (main.py:400); may be 0 (then the
    densified graphs are empty, exactly as the reference produces)."""
    return int(n_items * cfg.train.m_topk_rate)


def graph_capacity(cfg: ExperimentConfig, n_items: int, n_batch: int = 1) -> int:
    """Capacity of the densified-graph COO buffers.

    The reference's accumulation lists (``image_ui_index`` etc.) are reset
    ONLY inside a rebuild (main.py:396-397), never at epoch boundaries, so
    entries accumulated after an epoch's LAST rebuild leak into the next
    epoch: the first rebuild of epoch e >= 1 (at idx == T) sees the tail's
    ``(n_batch - 1) % T`` batches plus the T batches idx 0..T-1 — the true
    worst case is ``(T + (n_batch - 1) % T) * B * k`` entries, not T * B * k
    (found by the deterministic trainer-equivalence test; the old capacity
    silently clamp-overwrote the leaked tail).

    The initial modality graphs (= ui/iu, MMSSL/main.py:68-69) are NOT
    stored at this capacity — the step reads consts.ui/iu until the first
    rebuild (state.use_init), so the buffers stay at their true post-rebuild
    size instead of the interaction nnz."""
    k = densify_topk(cfg, n_items)
    t = max(cfg.train.densify_period, 1)
    cap = max((t + (max(n_batch, 1) - 1) % t) * cfg.data.batch_size * k, 1)
    return ((cap + 127) // 128) * 128


def interaction_rows(item_rows: jnp.ndarray, n_items: int) -> jnp.ndarray:
    """Binary [B, n_items] rows of the raw interaction matrix for a user
    batch (the reference materializes scipy rows to dense GPU tensors,
    main.py:285/349; here it is a static-shape scatter).

    ``item_rows`` is the gathered ``train_pad[users]`` ([B, max_deg], -1
    pad) — gathered once per step and shared with the low-rank fake-row
    correction (fake_row_parts)."""
    B = item_rows.shape[0]
    rows = jnp.where(item_rows < 0, n_items, item_rows)  # OOB pad -> dropped
    out = jnp.zeros((B, n_items), dtype=jnp.float32)
    return out.at[jnp.arange(B)[:, None], rows].set(1.0, mode="drop")


class FakeRowParts(NamedTuple):
    """Factorized form of one modality's fake rows (u_sim output).

    The fake row is  sim[b] = (S[b] * (1 - u_ui[b])) / r_b  with
    S = U I^T — rank-d plus a per-user sparse correction at the user's train
    items.  These parts let the discriminator's first layer be computed as
      z1[b] = (U[b] @ (I^T W1) - sum_d coeff[b,d] * W1[item_rows[b,d]]) / r_b
    without ever forming the [B, n_items] @ [n_items, H] product (and, under
    autodiff, without its transposed VJP products either).
    """

    u: jnp.ndarray       # [B, d] gathered user embeddings (compute dtype)
    i: jnp.ndarray       # [n_items, d] item embeddings (compute dtype)
    sim: jnp.ndarray     # [B, n_items] the materialized normalized rows
    inv_r: jnp.ndarray   # [B, 1] f32 inverse masked-row L2 norms
    coeff: jnp.ndarray   # [B, max_deg] f32 S values at the train items (0 at pad)
    item_rows: jnp.ndarray  # int32 [B, max_deg] train item ids (-1 pad)


def fake_row_parts(
    user_rows: jnp.ndarray,  # [B, d]
    item_emb: jnp.ndarray,  # [n_items, d]
    u_ui: jnp.ndarray,  # [B, n_items]
    item_rows: jnp.ndarray,  # int32 [B, max_deg] train_pad[users]
    dtype=None,
) -> FakeRowParts:
    """u_sim (main.py:283-298) computed with its factorization retained.

    ``sim`` is numerically identical to ``u_sim(...)`` (same masking /
    l2_normalize / storage-dtype rounding) so the GP interpolates and the
    densification top-k see the exact same rows as the direct path."""
    n_items = item_emb.shape[0]
    s = matmul(user_rows, item_emb.T, dtype)  # [B, n_items], f32 accumulation
    masked = s * (1.0 - u_ui)
    sim = l2_normalize(masked, axis=1)
    sim = sim if dtype is None else sim.astype(dtype)
    inv_r = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(masked * masked, axis=1, keepdims=True), 1e-24))
    idx = jnp.clip(item_rows, 0, n_items - 1)
    coeff = jnp.take_along_axis(s, idx, axis=1) * (item_rows >= 0)
    return FakeRowParts(user_rows, item_emb, sim, inv_r, coeff, item_rows)


def disc_z1_lowrank(l1: dict, parts: FakeRowParts, dtype=None) -> jnp.ndarray:
    """Discriminator first-layer affine on fake rows via the exact low-rank
    factorization (ModelConfig.disc_lowrank): replaces the
    [B, n_items] x [n_items, H] GEMM (and, under autodiff, its two transposed
    VJP GEMMs) with [*, d]-thin GEMMs plus a B*max_deg-row gather of W1.

    Composed from cheap primitives so reverse-mode AD derives the equally
    cheap backward: the U/I cotangents arrive through d-width GEMMs and the
    W1 cotangent through the gather's scatter-add — no [*, n_items] x
    [n_items, H] product appears in either direction."""
    w, b = l1["w"], l1["b"]
    itw = matmul(parts.i.T, w, dtype)  # [d, H]
    z = matmul(parts.u, itw, dtype)  # [B, H]
    idx = jnp.clip(parts.item_rows, 0, w.shape[0] - 1)
    w_rows = w[idx]  # [B, max_deg, H] gather (pad rows read row 0, coeff 0)
    cdt = dtype or w_rows.dtype
    corr = jnp.einsum(
        "bd,bdh->bh", parts.coeff.astype(cdt), w_rows.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    return (z - corr) * parts.inv_r + b


def u_sim(
    user_rows: jnp.ndarray,  # [B, d] gathered user embeddings
    item_emb: jnp.ndarray,  # [n_items, d]
    u_ui: jnp.ndarray,  # [B, n_items] binary interactions
    dtype=None,  # optional bf16 matmul inputs (ModelConfig.compute_dtype)
    mp_bwd: bool = False,  # bf16 cotangents (first-order paths only)
) -> jnp.ndarray:
    """``u_sim_calculation``: full-catalog scores, known interactions zeroed,
    rows L2-normalized (main.py:283-298).  One MXU matmul; the reference's
    item-chunking is a GPU-memory workaround with identical numerics.

    Under a low-precision ``dtype`` the normalized rows are also STORED at
    that dtype: every consumer of these [B, n_items] matrices (the
    discriminator tower, the WGAN-GP interpolates, the densification top-k)
    either casts them to ``dtype`` at its first matmul anyway or is
    rank-based, so keeping them f32 in HBM only doubles the DMA bytes of the
    widest activations in the step (mask/normalize math stays f32)."""
    sim = matmul(user_rows, item_emb.T, dtype, mp_bwd) * (1.0 - u_ui)
    sim = l2_normalize(sim, axis=1)
    return sim if dtype is None else sim.astype(dtype)


def gumbel_soften_rows(
    u_ui: jnp.ndarray, ui_sim: jnp.ndarray, rng: jax.Array, cfg: ExperimentConfig,
    dtype=None, n_items_real: "int | None" = None,
) -> jnp.ndarray:
    """'Real' rows for the discriminator (main.py:349-352, quirk Q4):
    softmax(u_ui + scale * gumbel / tau) + ui_sim * ui_pre_scale, L2 rows.
    Math in f32; stored at ``dtype`` when set (see u_sim).

    ``n_items_real``: with geometry-padded item tables the Gumbel noise is
    drawn at the REAL width (identical PRNG consumption to an unpadded run)
    and the pad logits are forced to -1e9, so the softmax mass — and hence
    the produced rows — exactly matches the unpadded computation."""
    t = cfg.train
    B, ni = u_ui.shape
    nr = n_items_real if n_items_real is not None else ni
    u = jax.random.uniform(rng, (B, nr), dtype=jnp.float32)
    gumbel = -jnp.log(-jnp.log(u + 1e-8) + 1e-8)
    logits = u_ui[:, :nr] + t.log_log_scale * gumbel / t.real_data_tau
    if nr != ni:
        logits = jnp.pad(logits, ((0, 0), (0, ni - nr)), constant_values=-1e9)
    soft = jax.nn.softmax(logits, axis=1)
    soft = soft + ui_sim.astype(jnp.float32) * t.ui_pre_scale
    soft = l2_normalize(soft, axis=1)
    return soft if dtype is None else soft.astype(dtype)


def gradient_penalty(
    d_params: dict,
    xr: jnp.ndarray,
    xf: jnp.ndarray,
    rng: jax.Array,
    cfg: ExperimentConfig,
) -> jnp.ndarray:
    """WGAN-GP (main.py:140-161): grad of D at interpolates, per-row L2 norm
    pulled to 1, LAMBDA=gp_lambda.  jax.grad-of-grad gives the second-order
    term the reference gets from autograd.grad(create_graph=True)."""
    r_alpha, r_drop = jax.random.split(rng)
    if cfg.parity.gp_alpha_override is not None:
        # Parity-testing instrument (ParityConfig.gp_alpha_override): a fixed
        # interpolation coefficient makes the trajectory deterministic for
        # cross-framework trainer-equivalence comparison.
        alpha = jnp.full((xr.shape[0], 1), cfg.parity.gp_alpha_override, jnp.float32)
    else:
        alpha = jax.random.uniform(r_alpha, (xr.shape[0], 1), dtype=jnp.float32)
    # keep the interpolates at the storage dtype of xr/xf (f32 math would
    # re-materialize the widest activation of the step at double width)
    interp = (alpha * xr + (1.0 - alpha) * xf).astype(xr.dtype)

    def d_sum(x):
        return jnp.sum(
            apply_discriminator(
                d_params, x, cfg.model, cfg.parity, train=True, rng=r_drop,
                act_dtype=resolve_dtype(cfg.model.gp_act_dtype),
            )
        )

    grads = jax.grad(d_sum)(interp)  # [MB, n_items], at interp's dtype
    # safe norm: zero-grad rows take the clamped branch (torch subgradient 0);
    # square-sum in f32 (a 7050-element bf16 accumulation would lose the norm)
    grads = grads.astype(jnp.float32)
    norms = jnp.sqrt(jnp.maximum(jnp.sum(grads**2, axis=1), 1e-24))
    return jnp.mean((norms - 1.0) ** 2) * cfg.train.gp_lambda


def _accumulate_or_rebuild(
    state: MMSSLTrainState,
    mod_sims: Dict[str, jnp.ndarray],  # [B, n_items] detached per modality
    users: jnp.ndarray,
    do_rebuild: jnp.ndarray,  # bool scalar
    cfg: ExperimentConfig,
    n_users: int,
    n_items: int,
    nu_pad: "int | None" = None,
    ni_pad: "int | None" = None,
) -> Tuple[Dict[str, SparseGraph], Dict[str, SparseGraph], Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    k = densify_topk(cfg, n_items)  # k from the REAL catalog size (main.py:400)
    nu_pad = nu_pad if nu_pad is not None else n_users
    ni_pad = ni_pad if ni_pad is not None else n_items
    modalities = sorted(mod_sims)
    new_ui, new_iu, new_rows, new_cols, new_cnt = {}, {}, {}, {}, {}
    for m in modalities:
        rows, cols, cnt = state.buf_rows[m], state.buf_cols[m], state.buf_count[m]
        cap = rows.shape[0]

        def rebuild(rows=rows, cols=cols, cnt=cnt, m=m):
            # Rebuilt graphs are COO in every graph_impl mode: their T*B*k
            # capacity makes the scatter negligible, while a dense rebuild
            # would re-scatter an n_users x n_items buffer every T batches.
            valid = jnp.arange(cap) < cnt
            g_ui = device_row_norm_inv_sqrt(rows, cols, valid, (nu_pad, ni_pad))
            g_iu = device_row_norm_inv_sqrt(cols, rows, valid, (ni_pad, nu_pad))
            return g_ui, g_iu, rows, cols, jnp.zeros((), jnp.int32)

        def accumulate(rows=rows, cols=cols, cnt=cnt, m=m):
            if k > 0:
                sims = mod_sims[m]
                if ni_pad != n_items:
                    # Geometry-padded item axis: pad columns hold exact zeros,
                    # which would outrank negative real scores — force them
                    # below any real value before the top-k.
                    sims = jnp.where(
                        jnp.arange(ni_pad) < n_items, sims, jnp.finfo(sims.dtype).min
                    )
                _, top_ids = jax.lax.top_k(sims, k)  # [B, k]
                if cfg.parity.densify_tiled_users:
                    # Quirk Q15 (main.py:401): the reference TILES the users
                    # vector k times against the row-major-flattened top-k
                    # ids, scrambling the user->item pairing.  Reproduced
                    # exactly (load-bearing for the published numbers).
                    add_rows = jnp.tile(users.astype(jnp.int32), k)
                else:
                    add_rows = jnp.repeat(users.astype(jnp.int32), k)
                add_cols = top_ids.reshape(-1).astype(jnp.int32)
                nr = jax.lax.dynamic_update_slice(rows, add_rows, (cnt,))
                nc = jax.lax.dynamic_update_slice(cols, add_cols, (cnt,))
                ncnt = cnt + add_rows.shape[0]
            else:
                nr, nc, ncnt = rows, cols, cnt
            return state.mod_ui[m], state.mod_iu[m], nr, nc, ncnt

        g_ui, g_iu, nr, nc, ncnt = jax.lax.cond(do_rebuild, rebuild, accumulate)
        new_ui[m], new_iu[m] = g_ui, g_iu
        new_rows[m], new_cols[m], new_cnt[m] = nr, nc, ncnt
    return new_ui, new_iu, new_rows, new_cols, new_cnt


def mmssl_train_step_impl(
    state: MMSSLTrainState,
    consts: MMSSLConsts,
    users: jnp.ndarray,  # int32 [B]
    pos: jnp.ndarray,
    neg: jnp.ndarray,
    do_rebuild: jnp.ndarray,  # bool scalar: idx % T == 0 and idx != 0
    cfg: ExperimentConfig,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    n_users: int,
    n_items: int,
    use_init_static: "bool | None" = None,
) -> Tuple[MMSSLTrainState, Dict[str, jnp.ndarray]]:
    t = cfg.train
    modalities = sorted(consts.feats)
    rng, r_fwd0, r_gum, r_df, r_dr, r_gp, r_gfwd, r_gd = jax.random.split(state.rng, 8)

    # Geometry padding (parallel/spmd.py): catalog tables may be padded to
    # mesh multiples; n_users/n_items stay the REAL counts (k, feat_reg
    # normalization) while array widths come from the padded shapes.  Pad
    # rows/columns hold exact zeros throughout (see models/mmssl
    # _mask_pad_rows), so every full-catalog computation below matches the
    # unpadded run bit-for-bit given the same PRNG draws.
    nu_pad = consts.train_pad.shape[0]
    ni_pad = next(iter(consts.feats.values())).shape[0]
    items_padded = ni_pad != n_items

    # use_init_static=False: the host knows the first densification rebuild
    # already happened (state.use_init is monotonically False afterwards), so
    # the per-step lax.cond in the modality-ID propagation is compiled out.
    # The cond is not free: its VJP materializes zero cotangents for the
    # captured dense ui/iu graphs (full [n_users, n_items] broadcasts +
    # pass-through copies, ~3 ms/step at Amazon-Baby scale).  None = dynamic
    # (the transition chunk).
    graphs = BipartiteGraphs(
        ui=consts.ui, iu=consts.iu, mod_ui=state.mod_ui, mod_iu=state.mod_iu,
        use_init=None if use_init_static is False else state.use_init,
    )
    item_rows = consts.train_pad[users]  # [B, max_deg], shared by u_ui + lowrank
    u_ui = interaction_rows(item_rows, ni_pad)
    # Static: resolved by the Trainer ('auto' -> 'on'/'off' given dtype,
    # max_deg, and the duplicate-train-items check).
    lowrank = cfg.model.disc_lowrank == "on"

    # ONE fused propagation pass for both per-batch forwards (the reference
    # runs two, main.py:339/363: a no-grad forward for the D step and a full
    # forward for the G step; their dropout-free parts are equal by
    # determinism and the modality branches differ only in the dropout
    # draw).  The G step pulls its gradients back through fwd_vjp; the D
    # step consumes the primals as constants.
    # r_gfwd stays in the 8-way split to keep the rng stream layout (and so
    # every other key) identical across the shared_fwd_draw settings; under
    # shared_draw the fused forward requires rng_g=None (the draw is rng_d's).
    fwd_fn = lambda p: mmssl_fused_forward(
        p, graphs, consts.feats, cfg.model, cfg.parity, r_fwd0,
        None if cfg.train.shared_fwd_draw else r_gfwd, train=True,
        n_items_real=n_items if items_padded else None,
        shared_draw=cfg.train.shared_fwd_draw,
    )
    if cfg.train.remat:
        fwd_fn = jax.checkpoint(fwd_fn)
    out, fwd_vjp = jax.vjp(fwd_fn, state.params)

    # ---- discriminator step (generator frozen, main.py:339-361) ----
    cdt = resolve_dtype(cfg.model.compute_dtype)
    uaD, iaD = mmssl_combine(out.det(), out.d_user_feats, out.d_item_feats, cfg.model)
    ui_sim = u_sim(uaD[users], iaD, u_ui, cdt)
    d_parts = {
        m: fake_row_parts(out.d_user_feats[m][users], out.d_item_feats[m], u_ui, item_rows, cdt)
        for m in modalities
    }
    inputf = jnp.concatenate([d_parts[m].sim for m in modalities], axis=0)  # [M*B, n_items]
    real = gumbel_soften_rows(
        u_ui, ui_sim, r_gum, cfg, cdt, n_items_real=n_items if items_padded else None
    )
    inputr = jnp.concatenate([real] * len(modalities), axis=0)

    fused_l1 = cfg.model.disc_fused_l1 and not lowrank

    def d_loss_fn(d_params):
        # mp_bwd: this tower is only differentiated once (w.r.t. d_params);
        # the GP tower below keeps the default backward (grad-of-grad).
        if lowrank:
            z1 = jnp.concatenate(
                [disc_z1_lowrank(d_params["l1"], d_parts[m], cdt) for m in modalities], axis=0
            )
            predf = discriminator_tower(
                d_params, z1, cfg.model, cfg.parity, train=True, rng=r_df, mp_bwd=True
            )
        elif fused_l1:
            # One l1 GEMM for the fake AND real towers: the
            # [(M+1)B, n_items] x [n_items, n_items/4] forward and its single
            # dW1 cotangent GEMM replace two of each (the l1 family is the
            # binding cost at Sports scale).  BatchNorm stats are computed
            # per tower AFTER the split and each tower keeps its own dropout
            # key, so numerics equal the separate-tower path exactly (up to
            # GEMM-tiling accumulation order).
            z1_all = linear(
                d_params["l1"], jnp.concatenate([inputf, real], axis=0), cdt, mp_bwd=True
            )
            predf = discriminator_tower(
                d_params, z1_all[: inputf.shape[0]], cfg.model, cfg.parity,
                train=True, rng=r_df, mp_bwd=True,
            )
            predr = discriminator_tower(
                d_params, z1_all[inputf.shape[0]:], cfg.model, cfg.parity,
                train=True, rng=r_dr, mp_bwd=True,
            )
        else:
            predf = apply_discriminator(
                d_params, inputf, cfg.model, cfg.parity, train=True, rng=r_df, mp_bwd=True
            )
        # The reference scores inputr = cat([real]*M) (main.py:353) — M exact
        # copies of the same B rows.  Scoring the unique B rows is equal in
        # everything but the per-copy dropout draw: BatchNorm statistics over
        # duplicated rows equal those over the unique rows, and
        # mean(predr[duplicated]) == mean(predr[unique]) row-for-row, so the
        # loss and its d_params gradient match in expectation exactly (and
        # bit-for-bit with dropout off).  Halves the predr tower cost; the
        # full-width inputr still feeds the gradient penalty below.
        if not fused_l1:
            predr = apply_discriminator(
                d_params, real, cfg.model, cfg.parity, train=True, rng=r_dr, mp_bwd=True
            )
        lossf = jnp.mean(predf)
        lossr = -jnp.mean(predr)
        gp = gradient_penalty(d_params, inputr, inputf, r_gp, cfg)
        return lossr + lossf + t.gp_rate * gp

    loss_d, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
    d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state, state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)

    # ---- generator step against updated D (main.py:363-429) ----
    # The generator loss is a pure function of the forward outputs (every
    # parameter dependency flows through them), so its parameter gradient is
    # one cotangent pull through fwd_vjp; the D-draw outputs receive zero
    # cotangents.
    def g_loss_fn(o: "MMSSLFusedOut"):
        fu, fi = o.g_user_feats, o.g_item_feats
        ua, ia = mmssl_combine(o.det(), fu, fi, cfg.model)
        mf, emb, reg = bpr_loss(ua[users], ia[pos], ia[neg], t.decay)
        fr = feat_reg_loss(
            [fi[m] for m in modalities] + [fu[m] for m in modalities],
            n_items,
            t.feat_reg_decay,
        )
        cl = jnp.zeros(())
        for m in modalities:
            cl = cl + infonce(o.mm_user_id[m][users], ua[users], t.cl_tau, eps=1e-8,
                              row_chunk=max(users.shape[0], 1))
        if lowrank:
            g_parts = {
                m: fake_row_parts(fu[m][users], fi[m], u_ui, item_rows, cdt)
                for m in modalities
            }
            mod_u_sims = {m: g_parts[m].sim for m in modalities}
            z1 = jnp.concatenate(
                [disc_z1_lowrank(d_params["l1"], g_parts[m], cdt) for m in modalities], axis=0
            )
            g_predf = discriminator_tower(
                d_params, z1, cfg.model, cfg.parity, train=True, rng=r_gd, mp_bwd=True
            )
        else:
            mod_u_sims = {m: u_sim(fu[m][users], fi[m], u_ui, cdt, mp_bwd=True) for m in modalities}
            g_inputf = jnp.concatenate([mod_u_sims[m] for m in modalities], axis=0)
            g_predf = apply_discriminator(
                d_params, g_inputf, cfg.model, cfg.parity, train=True, rng=r_gd, mp_bwd=True
            )
        g_lossf = -jnp.mean(g_predf)
        total = mf + emb + reg + fr + t.cl_rate * cl + t.g_rate * g_lossf
        aux = {
            "mf_loss": mf, "emb_loss": emb, "feat_reg": fr, "cl_loss": cl, "g_lossf": g_lossf,
            "mod_sims": {m: jax.lax.stop_gradient(v) for m, v in mod_u_sims.items()},
        }
        return total, aux

    (g_loss, aux), out_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(out)
    (g_grads,) = fwd_vjp(out_grads)
    g_updates, opt_state = g_opt.update(g_grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, g_updates)

    # ---- densification cadence (main.py:378-405) ----
    new_ui, new_iu, new_rows, new_cols, new_cnt = _accumulate_or_rebuild(
        state, aux["mod_sims"], users, do_rebuild, cfg, n_users, n_items,
        nu_pad=nu_pad, ni_pad=ni_pad,
    )

    new_state = MMSSLTrainState(
        params=params,
        d_params=d_params,
        opt_state=opt_state,
        d_opt_state=d_opt_state,
        mod_ui=new_ui,
        mod_iu=new_iu,
        buf_rows=new_rows,
        buf_cols=new_cols,
        buf_count=new_cnt,
        use_init=jnp.logical_and(state.use_init, jnp.logical_not(do_rebuild)),
        rng=rng,
        step=state.step + 1,
    )
    # One packed metric vector (ordered by MMSSL_METRIC_KEYS): a single
    # device buffer so the host pays ONE transfer per fetch — per-scalar
    # fetches each cost a full relay roundtrip (~29 ms on axon).
    metrics = jnp.stack([
        g_loss, loss_d, aux["mf_loss"], aux["emb_loss"],
        aux["feat_reg"], aux["cl_loss"], aux["g_lossf"],
    ])
    return new_state, metrics


mmssl_train_step = partial(
    jax.jit,
    static_argnames=("cfg", "g_opt", "d_opt", "n_users", "n_items", "use_init_static"),
    donate_argnums=(0,),
)(mmssl_train_step_impl)


def mmssl_train_epoch_impl(
    state: MMSSLTrainState,
    consts: MMSSLConsts,
    sampler: "DeviceSamplerConsts",
    start_idx: jnp.ndarray,  # int32 scalar: within-epoch index of the first step
    n_steps: int,
    use_init_static: "bool | None",
    cfg: ExperimentConfig,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    n_users: int,
    n_items: int,
) -> Tuple[MMSSLTrainState, jnp.ndarray]:
    """``n_steps`` MMSSL train steps as ONE device program.

    Sampling happens on device (data/sampler_device.py) so the scan needs no
    per-step host input; the densification cadence ``do_rebuild = (idx % T ==
    0) & (idx != 0)`` (main.py:378-397, quirk Q5) is computed from the carried
    within-epoch index.  Returns stacked metrics [n_steps, len(METRIC_KEYS)] —
    the host pays one dispatch plus one fetch for the whole chunk instead of a
    ~40 ms relay roundtrip per batch.
    """
    from mmssl_tpu.data.sampler_device import device_sample

    t = max(cfg.train.densify_period, 1)

    def body(carry: MMSSLTrainState, i: jnp.ndarray):
        idx = start_idx + i
        do_rebuild = jnp.logical_and(idx % t == 0, idx != 0)
        rng, r_samp = jax.random.split(carry.rng)
        carry = carry._replace(rng=rng)
        users, pos, neg = device_sample(r_samp, sampler, n_items, cfg.data.batch_size)
        new_state, metrics = mmssl_train_step_impl(
            carry, consts, users, pos, neg, do_rebuild,
            cfg, g_opt, d_opt, n_users, n_items,
            use_init_static=use_init_static,
        )
        return new_state, metrics

    state, metrics = jax.lax.scan(body, state, jnp.arange(n_steps))
    return state, metrics


mmssl_train_epoch = partial(
    jax.jit,
    static_argnames=("n_steps", "use_init_static", "cfg", "g_opt", "d_opt", "n_users", "n_items"),
    donate_argnums=(0,),
)(mmssl_train_epoch_impl)
