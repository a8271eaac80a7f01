"""MMSSL generator + discriminator (the flagship model).

Behavior contract: ``MMSSL/Models.py:17-245`` and its quirk ledger
(SURVEY.md §8.1), generalized from hardcoded image+text to an ordered list of
N modalities (with 2 modalities the math reduces exactly to the reference).

Forward structure (Models.py:171-220):
  1. per-modality projector + dropout on raw item features
  2. one round of bipartite feature propagation per modality
     (ui @ feats, iu @ user_feats) and modality-ID propagation over the
     *densified* per-modality graphs (mod_ui @ item_emb, mod_iu @ user_emb).
     The reference loops ``args.layers`` times but never reassigns the loop
     input, so every iteration recomputes identical values — we compute once.
  3. "multi-head self-attention" over the modality axis of the ID embeddings.
     Faithfully reproduced including quirks Q1 (K is recomputed from Q) and
     Q2 (the model_cat_rate rescale of the output is computed-and-discarded).
     Note: because the attention weights are softmax-normalized over the
     source-modality axis and V is broadcast over that same axis, the
     attention output algebraically equals V repeated per head times w_cat —
     the quirks make w_q/w_k gradient-free.  We keep the faithful form.
  4. u/i = id_emb + id_cat_rate * l2norm(mean over modalities)
  5. n_ui_layers LightGCN passes over the normalized u-i graphs with quirk Q3
     (row-softmax wrapping on the last layer), mean over the layer stack
  6. residual fusion: += model_cat_rate * l2norm(per-modality feats)

Discriminator (Models.py:224-245): MLP n_items -> n/4 -> n/8 -> 1 with
LeakyReLU(negative_slope=True == 1.0, quirk Q14 -> identity), BatchNorm1d,
Dropout, and a 100 * sigmoid output head.  Linear weights use kaiming-normal
with zero bias (``weights_init``, MMSSL/main.py:135-138).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mmssl_tpu.config import ModelConfig, ParityConfig
from mmssl_tpu.models.common import (
    batchnorm,
    dropout,
    init_batchnorm,
    init_linear,
    kaiming_normal,
    l2_normalize,
    leaky_relu,
    linear,
    resolve_dtype,
    xavier_uniform,
)
from mmssl_tpu.ops.sparse import SparseGraph


class BipartiteGraphs(NamedTuple):
    """Normalized interaction graphs feeding the forward pass.

    ``ui``/``iu`` are the (static) normalized interaction graphs; ``mod_ui``/
    ``mod_iu`` are the per-modality densified graphs that start equal to
    ui/iu (MMSSL/main.py:68-69) and are rebuilt during training.

    ``use_init`` (bool scalar, optional): when set, the modality-ID
    propagation reads ui/iu until the first densification rebuild instead of
    per-modality copies.  This lets the densified graphs carry only
    ``T*B*k`` capacity (their true post-rebuild size, often 100-1000x
    smaller than the interaction nnz) — the per-entry-latency-bound
    segment-sum scatters then cost proportionally less.  When None the mod
    graphs are used directly (parity-test construction).
    """

    ui: Any  # SparseGraph | DenseGraph, [n_users, n_items]
    iu: Any  # SparseGraph | DenseGraph, [n_items, n_users]
    mod_ui: Dict[str, Any]  # densified per-modality graphs (same union)
    mod_iu: Dict[str, Any]
    use_init: Optional[jnp.ndarray] = None  # bool scalar


class MMSSLOutput(NamedTuple):
    user_emb: jnp.ndarray  # [n_users, d] final fused user embeddings
    item_emb: jnp.ndarray  # [n_items, d]
    mm_user_feats: Dict[str, jnp.ndarray]  # feature-propagated, per modality
    mm_item_feats: Dict[str, jnp.ndarray]
    mm_user_id: Dict[str, jnp.ndarray]  # densified-graph ID propagation
    mm_item_id: Dict[str, jnp.ndarray]


def init_mmssl(
    key: jax.Array,
    n_users: int,
    n_items: int,
    feat_dims: Mapping[str, int],
    cfg: ModelConfig,
) -> dict:
    d = cfg.embed_size
    modalities = sorted(feat_dims)
    keys = jax.random.split(key, 6 + len(modalities))
    params = {
        "user_emb": xavier_uniform(keys[0], (n_users, d)),
        "item_emb": xavier_uniform(keys[1], (n_items, d)),
        "w_q": xavier_uniform(keys[2], (d, d)),
        # w_k / w_v exist in the reference parameter dict but are forward-dead
        # under quirk Q1 (K recomputed from Q, V raw); kept for checkpoint
        # completeness.
        "w_k": xavier_uniform(keys[3], (d, d)),
        "w_v": xavier_uniform(keys[4], (d, d)),
        "w_cat": xavier_uniform(keys[5], (cfg.head_num * d, d)),
        "proj": {},
    }
    for i, m in enumerate(modalities):
        params["proj"][m] = init_linear(keys[6 + i], feat_dims[m], d)
    return params


def modality_attention(
    params: dict,
    emb_stack: jnp.ndarray,  # [M, N, d] per-modality embeddings
    head_num: int,
    parity: ParityConfig,
    model_cat_rate: float,
    impl: str = "faithful",
) -> jnp.ndarray:
    """``multi_head_self_attention`` (Models.py:139-169).  Returns [M, N, d].

    impl='algebraic' uses an exact identity: Z[h,m,n,:] = sum_s att[h,m,s,n]
    * V[m,n,:] where V does not depend on the summation axis s, so Z = V *
    (sum_s att) = V (softmax rows sum to 1).  The gradient through att is
    also exactly zero — the cotangent entering the softmax is constant in s,
    and the softmax VJP of a constant cotangent vanishes — so w_q/w_k get
    identically zero gradient in the faithful form too.  The algebraic path
    therefore matches the faithful one in value AND gradient up to fp
    rounding while skipping the [H, M, M, N] einsum/softmax entirely
    (~1 ms/step at Amazon-Baby scale in awkward (2,128)-tiled fusions).
    """
    M, N, d = emb_stack.shape
    if impl == "algebraic":
        Zc = jnp.tile(emb_stack, (1, 1, head_num))  # every head outputs V
        Z = Zc @ params["w_cat"]
        if not parity.discard_attention_rescale:
            Z = model_cat_rate * l2_normalize(Z, axis=2)
        return Z
    dh = d // head_num
    q = emb_stack
    Q = q @ params["w_q"]
    K = Q if parity.attention_k_equals_q else q @ params["w_k"]
    V = q  # reference uses raw v (w_v unused)
    Qh = Q.reshape(M, N, head_num, dh).transpose(2, 0, 1, 3)  # [H, M, N, dh]
    Kh = K.reshape(M, N, head_num, dh).transpose(2, 0, 1, 3)
    att = jnp.einsum("hmnd,hsnd->hmsn", Qh, Kh) / math.sqrt(float(d) / head_num)
    att = jax.nn.softmax(att, axis=2)  # over source modality
    # Reference broadcast: V indexed by the *target* modality (SURVEY.md Q1/Q2
    # discussion); sum over source modalities of att * V[target].
    Z = jnp.einsum("hmsn,mnd->hmnd", att, V)  # [H, M, N, d]
    Zc = Z.transpose(1, 2, 0, 3).reshape(M, N, head_num * d)
    Z = Zc @ params["w_cat"]
    if not parity.discard_attention_rescale:
        Z = model_cat_rate * l2_normalize(Z, axis=2)
    return Z


def _mask_pad_rows(x: jnp.ndarray, n_real: Optional[int]) -> jnp.ndarray:
    """Zero the geometry-padding tail rows (parallel sharding pads catalog
    tables to mesh multiples; see Trainer._build_mmssl).  Pad rows stay
    exactly zero through every propagation (the padded graphs have zero pad
    rows/columns) EXCEPT through quirk Q3's last-layer row-softmax, which
    turns a zero row into a uniform one — this mask restores the invariant so
    full-catalog consumers (u_sim columns, the discriminator input width)
    see zeros at pad positions.  No-op when n_real is None or nothing is
    padded; real rows (values and gradients) are untouched."""
    if n_real is None or n_real == x.shape[0]:
        return x
    return x * (jnp.arange(x.shape[0]) < n_real)[:, None].astype(x.dtype)


class MMSSLDeterministic(NamedTuple):
    """Outputs of the dropout-free branch (ID propagation + attention +
    LightGCN).  Identical between the D-step and G-step forwards of one
    batch, so the train step computes it once per step via an explicit VJP
    (the reference recomputes it; values are equal by determinism)."""

    user_base: jnp.ndarray  # [n_users, d] GCN output before feat residuals
    item_base: jnp.ndarray
    mm_user_id: Dict[str, jnp.ndarray]
    mm_item_id: Dict[str, jnp.ndarray]


def _id_attention_base(
    params: dict,
    graphs: BipartiteGraphs,
    cfg: ModelConfig,
    parity: ParityConfig,
    modalities: Tuple[str, ...],
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Modality-ID propagation over the densified graphs + attention fusion +
    residual into the ID tables (Models.py:179-197).  Returns (u_g, i_g,
    mm_user_id, mm_item_id)."""
    def _mod_spmm(g_small, g_init, x):
        if graphs.use_init is None:
            return g_small.spmm(x)
        return jax.lax.cond(
            graphs.use_init, lambda: g_init.spmm(x), lambda: g_small.spmm(x)
        )

    mm_user_id = {m: _mod_spmm(graphs.mod_ui[m], graphs.ui, params["item_emb"]) for m in modalities}
    mm_item_id = {m: _mod_spmm(graphs.mod_iu[m], graphs.iu, params["user_emb"]) for m in modalities}

    user_stack = jnp.stack([mm_user_id[m] for m in modalities], axis=0)
    item_stack = jnp.stack([mm_item_id[m] for m in modalities], axis=0)
    user_z = modality_attention(
        params, user_stack, cfg.head_num, parity, cfg.model_cat_rate, cfg.attention_impl
    )
    item_z = modality_attention(
        params, item_stack, cfg.head_num, parity, cfg.model_cat_rate, cfg.attention_impl
    )
    user_fused = jnp.mean(user_z, axis=0)
    item_fused = jnp.mean(item_z, axis=0)

    u_g = params["user_emb"] + cfg.id_cat_rate * l2_normalize(user_fused, axis=1)
    i_g = params["item_emb"] + cfg.id_cat_rate * l2_normalize(item_fused, axis=1)
    return u_g, i_g, mm_user_id, mm_item_id


def mmssl_deterministic_branch(
    params: dict,
    graphs: BipartiteGraphs,
    cfg: ModelConfig,
    parity: ParityConfig,
    modalities: Tuple[str, ...],
    n_items_real: Optional[int] = None,
) -> MMSSLDeterministic:
    """Steps 2b-5 of the forward (Models.py:179-214): modality-ID propagation
    over the densified graphs, attention fusion, residual into the ID tables,
    LightGCN stack with quirk Q3.  ``n_items_real``: real catalog size when
    the item tables are geometry-padded to a mesh multiple (pad rows of
    item_base are re-zeroed after Q3's softmax, see _mask_pad_rows)."""
    u_g, i_g, mm_user_id, mm_item_id = _id_attention_base(params, graphs, cfg, parity, modalities)

    user_acc, item_acc = u_g, i_g
    i_cur = i_g
    for layer in range(cfg.n_ui_layers):
        last = layer == cfg.n_ui_layers - 1
        u_nxt = graphs.ui.spmm(i_cur)
        if last and parity.softmax_last_gcn_layer:
            u_nxt = jax.nn.softmax(u_nxt, axis=-1)
        i_nxt = graphs.iu.spmm(u_nxt)
        if last and parity.softmax_last_gcn_layer:
            i_nxt = jax.nn.softmax(i_nxt, axis=-1)
        user_acc = user_acc + u_nxt
        item_acc = item_acc + i_nxt
        i_cur = i_nxt
    return MMSSLDeterministic(
        user_base=user_acc / (cfg.n_ui_layers + 1),
        item_base=_mask_pad_rows(item_acc / (cfg.n_ui_layers + 1), n_items_real),
        mm_user_id=mm_user_id,
        mm_item_id=mm_item_id,
    )


def _project_modalities(
    params: dict,
    feats: Mapping[str, jnp.ndarray],
    cfg: ModelConfig,
    train: bool,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    """Per-modality projector + dropout (Models.py:173-174), concatenated to
    [n_items, M*d].  Dropout keys are drawn per modality in sorted order."""
    dt = resolve_dtype(cfg.compute_dtype)
    projs = []
    for m in sorted(feats):
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        # mp_bwd: the projectors only appear on first-order paths (the
        # generator VJP); their weight-grad dots ride bf16 both ways.
        projs.append(
            dropout(sub, linear(params["proj"][m], feats[m], dt, mp_bwd=True), cfg.drop_rate, train)
        )
    return jnp.concatenate(projs, axis=1)


def mmssl_modality_feats(
    params: dict,
    graphs: BipartiteGraphs,
    feats: Mapping[str, jnp.ndarray],
    cfg: ModelConfig,
    train: bool,
    rng: Optional[jax.Array],
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Steps 1-2a (Models.py:173-183): per-modality projector + dropout +
    bipartite feature propagation.  The propagations are batched into ONE
    wide SpMM across modalities (concat along features): the segment-sum
    scatter is latency-bound per entry, so widening the rows from d to M*d
    costs almost nothing while cutting the scatter count M-fold."""
    modalities = sorted(feats)
    d = cfg.embed_size
    stacked = _project_modalities(params, feats, cfg, train, rng)  # [n_items, M*d]
    user_wide = graphs.ui.spmm(stacked)
    item_wide = graphs.iu.spmm(user_wide)
    mm_user_feats = {m: user_wide[:, i * d : (i + 1) * d] for i, m in enumerate(modalities)}
    mm_item_feats = {m: item_wide[:, i * d : (i + 1) * d] for i, m in enumerate(modalities)}
    return mm_user_feats, mm_item_feats


class MMSSLFusedOut(NamedTuple):
    """One-shot forward outputs for the adversarial train step: the shared
    deterministic branch plus TWO independent dropout draws of the modality
    branch (the reference runs two full forwards per batch, main.py:339/363;
    their dropout-free parts are equal by determinism and their modality
    propagations differ only in the dropout mask)."""

    user_base: jnp.ndarray
    item_base: jnp.ndarray
    mm_user_id: Dict[str, jnp.ndarray]
    mm_item_id: Dict[str, jnp.ndarray]
    d_user_feats: Dict[str, jnp.ndarray]  # D-step draw
    d_item_feats: Dict[str, jnp.ndarray]
    g_user_feats: Dict[str, jnp.ndarray]  # G-step draw
    g_item_feats: Dict[str, jnp.ndarray]

    def det(self) -> MMSSLDeterministic:
        return MMSSLDeterministic(
            user_base=self.user_base, item_base=self.item_base,
            mm_user_id=self.mm_user_id, mm_item_id=self.mm_item_id,
        )


def mmssl_fused_forward(
    params: dict,
    graphs: BipartiteGraphs,
    feats: Mapping[str, jnp.ndarray],
    cfg: ModelConfig,
    parity: ParityConfig,
    rng_d: jax.Array,
    rng_g: Optional[jax.Array],
    train: bool = True,
    n_items_real: Optional[int] = None,
    shared_draw: bool = False,
) -> MMSSLFusedOut:
    """Both per-batch forwards (D-step + G-step) as ONE propagation pass.

    The segment-sum scatters that implement SpMM on TPU are latency-bound
    per nnz entry, nearly independent of the operand width — so the two
    modality stacks (2 draws x M modalities x d) ride the SAME ui/iu
    scatters as the first LightGCN layer, concatenated along features and
    sliced back out.  Per-column-block segment sums are independent, so
    numerics are identical to separate propagation.  SpMM count per step
    drops from 8 wide scatters (2 draws x 2 directions + 2 layers x 2) to 4.

    With ``shared_draw`` (TrainConfig.shared_fwd_draw) BOTH forwards reuse
    the rng_d modality draw: the stack narrows from [d + 2*M*d] to
    [d + M*d] and the d_*/g_* outputs alias the same arrays.  Numerically
    identical to calling the unshared path with rng_g == rng_d; a
    distributional change vs the reference's two independent draws
    (quality-protocol gated — docs/performance.md).  ``rng_g`` MUST be None
    under shared_draw (a meaningful G key would be silently ignored —
    ADVICE r4) and MUST be a key otherwise.
    """
    assert cfg.n_ui_layers >= 1, "fused forward piggybacks on GCN layer 1"
    if shared_draw:
        assert rng_g is None, (
            "shared_draw=True reuses rng_d for both forwards; pass rng_g=None "
            "(a separate G key would be silently ignored)")
    else:
        assert rng_g is not None, "unshared fused forward needs a G draw key"
    modalities = tuple(sorted(feats))
    d = cfg.embed_size
    Md = len(modalities) * d
    u_g, i_g, mm_user_id, mm_item_id = _id_attention_base(params, graphs, cfg, parity, modalities)

    stacked_d = _project_modalities(params, feats, cfg, train, rng_d)  # [n_items, Md]
    stacked_g = None if shared_draw else _project_modalities(params, feats, cfg, train, rng_g)

    user_acc, item_acc = u_g, i_g
    i_cur = i_g
    uw_d = uw_g = iw_d = iw_g = None
    for layer in range(cfg.n_ui_layers):
        last = layer == cfg.n_ui_layers - 1
        if layer == 0:
            blocks = [i_cur, stacked_d] if shared_draw else [i_cur, stacked_d, stacked_g]
            wide_u = graphs.ui.spmm(jnp.concatenate(blocks, axis=1))
            u_nxt, uw_d = wide_u[:, :d], wide_u[:, d : d + Md]
            uw_g = uw_d if shared_draw else wide_u[:, d + Md :]
            if last and parity.softmax_last_gcn_layer:
                u_nxt = jax.nn.softmax(u_nxt, axis=-1)
            blocks = [u_nxt, uw_d] if shared_draw else [u_nxt, uw_d, uw_g]
            wide_i = graphs.iu.spmm(jnp.concatenate(blocks, axis=1))
            i_nxt, iw_d = wide_i[:, :d], wide_i[:, d : d + Md]
            iw_g = iw_d if shared_draw else wide_i[:, d + Md :]
            if last and parity.softmax_last_gcn_layer:
                i_nxt = jax.nn.softmax(i_nxt, axis=-1)
        else:
            u_nxt = graphs.ui.spmm(i_cur)
            if last and parity.softmax_last_gcn_layer:
                u_nxt = jax.nn.softmax(u_nxt, axis=-1)
            i_nxt = graphs.iu.spmm(u_nxt)
            if last and parity.softmax_last_gcn_layer:
                i_nxt = jax.nn.softmax(i_nxt, axis=-1)
        user_acc = user_acc + u_nxt
        item_acc = item_acc + i_nxt
        i_cur = i_nxt

    def _split(wide):
        return {m: wide[:, i * d : (i + 1) * d] for i, m in enumerate(modalities)}

    du, di = _split(uw_d), _split(iw_d)
    return MMSSLFusedOut(
        user_base=user_acc / (cfg.n_ui_layers + 1),
        item_base=_mask_pad_rows(item_acc / (cfg.n_ui_layers + 1), n_items_real),
        mm_user_id=mm_user_id,
        mm_item_id=mm_item_id,
        d_user_feats=du,
        d_item_feats=di,
        g_user_feats=du if shared_draw else _split(uw_g),
        g_item_feats=di if shared_draw else _split(iw_g),
    )


def mmssl_combine(
    det: MMSSLDeterministic,
    mm_user_feats: Mapping[str, jnp.ndarray],
    mm_item_feats: Mapping[str, jnp.ndarray],
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Step 6 (Models.py:217-218): modality-feature residual fusion."""
    u_g, i_g = det.user_base, det.item_base
    for m in sorted(mm_user_feats):
        u_g = u_g + cfg.model_cat_rate * l2_normalize(mm_user_feats[m], axis=1)
        i_g = i_g + cfg.model_cat_rate * l2_normalize(mm_item_feats[m], axis=1)
    return u_g, i_g


def apply_mmssl(
    params: dict,
    graphs: BipartiteGraphs,
    feats: Mapping[str, jnp.ndarray],  # modality -> [n_items, feat_dim]
    cfg: ModelConfig,
    parity: ParityConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    n_items_real: Optional[int] = None,
) -> MMSSLOutput:
    modalities = tuple(sorted(feats))
    # NOTE rng threading: dropout keys are drawn per modality inside
    # mmssl_modality_feats in the same (sorted) order as the original
    # monolithic forward, so draws are unchanged.
    mm_user_feats, mm_item_feats = mmssl_modality_feats(params, graphs, feats, cfg, train, rng)
    det = mmssl_deterministic_branch(params, graphs, cfg, parity, modalities, n_items_real)
    u_g, i_g = mmssl_combine(det, mm_user_feats, mm_item_feats, cfg)
    return MMSSLOutput(
        user_emb=u_g,
        item_emb=i_g,
        mm_user_feats=mm_user_feats,
        mm_item_feats=mm_item_feats,
        mm_user_id=det.mm_user_id,
        mm_item_id=det.mm_item_id,
    )


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

def init_discriminator(key: jax.Array, n_items: int, cfg: ModelConfig) -> dict:
    # Clamp the hidden widths to >=1: the reference's integer division
    # (Models.py:226-228) yields zero-width layers for catalogs under 8
    # items, which torch silently accepts and we would crash on (degenerate
    # either way; identical for any realistic catalog).
    h1, h2 = max(n_items // 4, 1), max(n_items // 8, 1)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l1": {"w": kaiming_normal(k1, (n_items, h1)), "b": jnp.zeros((h1,))},
        "bn1": init_batchnorm(h1),
        "l2": {"w": kaiming_normal(k2, (h1, h2)), "b": jnp.zeros((h2,))},
        "bn2": init_batchnorm(h2),
        "l3": {"w": kaiming_normal(k3, (h2, 1)), "b": jnp.zeros((1,))},
    }


def apply_discriminator(
    params: dict,
    x: jnp.ndarray,  # [B, n_items] full-catalog score rows
    cfg: ModelConfig,
    parity: ParityConfig,
    train: bool = True,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    mp_bwd: bool = False,
    act_dtype=None,
) -> jnp.ndarray:
    """Returns [B] scores in [0, 100] (quirk Q8: 100 * sigmoid).

    ``mp_bwd``: round backward cotangents of the Linear layers to the compute
    dtype (see models/common.matmul) — only legal on strictly first-order
    paths; the WGAN-GP tower (grad-of-grad) must leave it False.

    ``act_dtype``: storage dtype for the tower activations between blocks.
    Cotangent dtypes follow primal dtypes under autodiff, so a bf16
    ``act_dtype`` makes ALL backward (and second-order) dots of the tower run
    bf16 x bf16 without custom VJPs — the mixed-precision lever that IS legal
    on the twice-differentiated GP tower."""
    dt = resolve_dtype(cfg.compute_dtype)
    z1 = linear(params["l1"], x, dt, mp_bwd)
    return discriminator_tower(params, z1, cfg, parity, train, rng, axis_name, mp_bwd, act_dtype)


def discriminator_tower(
    params: dict,
    z1: jnp.ndarray,  # [B, n_items//4] first-layer affine output (pre-activation)
    cfg: ModelConfig,
    parity: ParityConfig,
    train: bool = True,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    mp_bwd: bool = False,
    act_dtype=None,
) -> jnp.ndarray:
    """The discriminator from the first LeakyReLU on — split out so the
    first-layer affine can be produced either directly (x @ W1 + b) or via
    the low-rank fake-row factorization (steps_mmssl.disc_z1_lowrank)."""
    slope = 1.0 if parity.discriminator_identity_leak else 0.01
    dt = resolve_dtype(cfg.compute_dtype)
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    cast = (lambda h: h.astype(act_dtype)) if act_dtype is not None else (lambda h: h)

    # NOTE: storing the tower activations at bf16 between BN/dropout was
    # tried and measured SLOWER on the FIRST-ORDER towers (14.0 vs 13.5
    # ms/step at Baby scale): the inserted casts break XLA's GEMM+BN-stat
    # fusions and the extra materializations cost more than the halved
    # elementwise bytes.  act_dtype therefore defaults to None; the GP tower
    # opts in (see apply_discriminator docstring).
    h = cast(leaky_relu(z1, slope))
    h = cast(batchnorm(params["bn1"], h, axis_name=axis_name))
    h = dropout(r1, h, cfg.g_drop1, train)
    h = cast(leaky_relu(linear(params["l2"], h, dt, mp_bwd), slope))
    h = cast(batchnorm(params["bn2"], h, axis_name=axis_name))
    h = dropout(r2, h, cfg.g_drop2, train)
    out = 100.0 * jax.nn.sigmoid(linear(params["l3"], h, dt, mp_bwd))
    return out[:, 0]
