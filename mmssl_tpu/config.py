"""Typed experiment configuration.

Replaces the reference's three divergent argparse copies
(``MMSSL/utility/parser.py:3-102``, ``LATTICE/codes/utility/parser.py``,
``MICRO/codes/utility/parser.py``) with one frozen dataclass tree.  Only the
*live* flags are kept (the reference carries ~25 dead flags, see SURVEY.md
§8.2); defaults reproduce the hyperparameters that produced the published
numbers (``MMSSL/utility/parser.py`` defaults, SURVEY.md §8.4).

Quirks of the reference that are load-bearing for numerical parity (SURVEY.md
§8.1) are controlled by :class:`ParityConfig` so they can be individually
disabled for "fixed" runs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence


@dataclass(frozen=True)
class ParityConfig:
    """Reproduce reference quirks exactly (SURVEY.md §8.1 quirk ledger).

    Each field cites the quirk it gates.  All default to True because the
    published numbers were produced with these behaviors.
    """

    # Q1 (Models.py:150): attention K is recomputed from Q, so scores are Q.Q.
    attention_k_equals_q: bool = True
    # Q2 (Models.py:168): attention output is NOT rescaled by model_cat_rate
    # (the expression result is discarded in the reference).
    discard_attention_rescale: bool = True
    # Q3 (Models.py:202-204): final LightGCN layer wraps embeddings in a
    # row-softmax before the mean over the layer stack.
    softmax_last_gcn_layer: bool = True
    # Q6 (main.py:81-87): the MMSSL LR scheduler is constructed but never
    # stepped -> constant LR for both optimizers.
    mmssl_constant_lr: bool = True
    # Q14 (Models.py:230 ``nn.LeakyReLU(True)``): the first positional arg of
    # LeakyReLU is negative_slope, so slope == 1.0 -> identity activation in
    # the discriminator MLP.
    discriminator_identity_leak: bool = True
    # Q9 (metrics.py:61-71): NDCG ideal-DCG is the DCG of the *retrieved*
    # binary vector sorted, not min(K, |pos|) ones.
    ndcg_retrieved_ideal: bool = True
    # Q11 (main.py:503-504): BPR L2 regularizer divides by batch_size (not 2B)
    # and covers only the gathered rows.
    bpr_reg_batch_div: bool = True
    # Q15 (main.py:401,404): the densification accumulation builds its user
    # column as ``torch.tensor(users).repeat(1, k).view(-1)`` — which TILES
    # the whole users vector k times ([u0..uB-1, u0..uB-1, ...]) — while the
    # top-k item ids flatten row-major ([topk(u0), topk(u1), ...]), so entry
    # j pairs users[j % B] with topk[j // k]: a SCRAMBLED user->item
    # assignment.  Found by the deterministic trainer-equivalence test (the
    # first post-rebuild step diverged ~8%); load-bearing for the published
    # numbers.  False = the evidently intended aligned repeat.
    densify_tiled_users: bool = True
    # Parity-testing instrument (not a reference quirk): fix the WGAN-GP
    # interpolation draw alpha (main.py:147) to a constant so a reference run
    # with the same fixed alpha becomes deterministic across frameworks —
    # used by the trainer-equivalence test to compare full training
    # trajectories to fp tolerance.  None = the reference's uniform draw.
    gp_alpha_override: "float | None" = None


@dataclass(frozen=True)
class DataConfig:
    """Dataset location + loading knobs.

    On-disk contract (SURVEY.md §8.3, ``MMSSL/main.py:54-58``,
    ``load_data.py:15-17``): ``train/val/test.json`` mapping str(uid) ->
    [item ids], ``image_feat.npy``/``text_feat.npy`` [n_items, d], and a
    pickled scipy csr ``train_mat``.
    """

    data_path: str = ""
    dataset: str = "baby"
    batch_size: int = 1024
    # Modality feature files to load, in order. The reference hardcodes
    # image+text (MMSSL/main.py:54-55); we generalize to N modalities
    # (Tiktok is tri-modal: visual/acoustic/text).
    modalities: tuple[str, ...] = ("image", "text")
    # Count items the way MMSSL does (max id + 1 over all splits,
    # load_data.py:29-55). LATTICE/MICRO instead use text_feat.shape[0]
    # (MICRO/codes/utility/load_data.py:63-64).
    n_items_from_feats: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters shared across the model zoo."""

    name: str = "mmssl"  # mmssl | lattice | micro | lightgcn | ngcf | mf
    embed_size: int = 64  # parser.py:55
    # len(weight_size) == number of u-i GCN layers (parser.py:82, main.py:49).
    n_ui_layers: int = 2
    # Modality feature-propagation layers (parser.py:12 --layers).
    n_mm_layers: int = 1
    head_num: int = 4  # parser.py:77
    drop_rate: float = 0.2  # parser.py:72
    model_cat_rate: float = 0.55  # parser.py:73
    id_cat_rate: float = 0.36  # parser.py:75
    # LATTICE / MICRO item-item graph knobs.
    knn_topk: int = 10  # parser.py:57 --topk
    lambda_coeff: float = 0.9  # LATTICE parser --lambda_coeff
    # item-item propagation layer count for LATTICE/MICRO (--n_layers /
    # --layers in their parsers).
    n_item_layers: int = 1
    norm_type: str = "sym"  # MICRO --norm_type {sym, rw, none}
    # MICRO --sparse (MICRO/codes/utility/parser.py): True = COO modality
    # item-item graphs via torch_scatter-style laplacians (the reference
    # default, norm.py:4-41); False = dense laplacians (norm.py:44-53).  On
    # TPU the dense mode rides the MXU — the COO spmm is a per-entry-latency
    # scatter (docs/performance.md rule 1) — with identical math.
    micro_sparse: bool = True
    cf_model: str = "lightgcn"  # CF branch for LATTICE/MICRO {lightgcn,ngcf,mf}
    # NGCF message dropout per layer (reference --mess_dropout).
    mess_dropout: tuple[float, ...] = (0.1, 0.1)
    # Discriminator (MMSSL/Models.py:224-245).
    g_drop1: float = 0.31  # parser.py:84
    g_drop2: float = 0.5  # parser.py:85
    # Propagation backend for the STATIC graphs (MMSSL ui/iu, CF joint adj).
    # 'coo' = padded-COO segment-sum SpMM (exact, the parity default).
    # 'dense' = materialized adjacency bf16/f32 MXU matmuls — on TPU the COO
    # gather+scatter moves ~2x the adjacency bytes and serializes per entry
    # (measured 51% of the MMSSL step at Baby scale), while the dense bf16
    # matmul streams the matrix once through the MXU; at <=0.1% sparsity the
    # redundant FLOPs are free.  Densified modality graphs always stay COO
    # (tiny T*B*k capacity; a dense rebuild would re-scatter the full matrix
    # every T batches).
    graph_impl: str = "coo"  # coo | dense
    # dense-mode storage: bfloat16 | float32 values, int8 entry counts +
    # f32 row scale (halves graph HBM reads; exact for the row-constant
    # normalized graphs — see ops/sparse.DenseGraph), or 'bit' — packed
    # one-bit interaction bitmaps for the CF joint propagation (8x fewer
    # graph bytes; exact for binary interactions, the reference data
    # contract; ops/sparse.BitBipartiteJointGraph, VERDICT r3 #9).  'bit'
    # applies to the simple-model joint blocks only (MMSSL's graph engine
    # is MXU-FLOP-bound at its stack width — nothing to save).
    graph_dtype: str = "bfloat16"
    # Input dtype of the hot GEMMs (discriminator MLP, modality projectors,
    # full-catalog u_sim sweeps).  'bfloat16' casts the matmul operands to
    # bf16 with f32 accumulation (preferred_element_type) — the discriminator
    # alone is ~0.7 TFLOP/step at Baby scale in f32, and the MXU runs bf16 at
    # ~2x f32 throughput with half the HBM operand traffic.  'float32' is the
    # parity default (the reference computes everything in f32).
    compute_dtype: str = "float32"  # float32 | bfloat16
    # "Multi-head self-attention" implementation (MMSSL/Models.py:139-169).
    # 'algebraic' exploits an exact identity of the reference's formula: the
    # softmax normalizes over the source-modality axis while V is indexed
    # only by the TARGET modality, so every attention output equals V and
    # w_q/w_k receive identically zero gradient — the whole Q/K/softmax
    # pipeline is dead compute (value AND gradient equal to the faithful
    # form up to fp rounding; see models/mmssl.modality_attention).
    # 'faithful' computes the reference's expression verbatim.
    attention_impl: str = "algebraic"  # algebraic | faithful
    # Discriminator first layer on FAKE rows (the masked L2-normalized
    # similarity rows, u_sim main.py:283-298) computed via the exact low-rank
    # factorization  z1 = inv_r * (U @ (I^T W1) - sum_{j in items(u)} S[u,j]
    # W1[j]) + b1  instead of materialized_rows @ W1: the fake rows are
    # rank-embed_size plus a per-user sparse correction, so the three
    # remaining [*, n_items] x [n_items, n_items/4] GEMMs of the step (predf
    # forward + its W1 grad, G-step predf forward + its input grad) collapse
    # to [*, d] GEMMs + one W1 row gather.  Exact in real arithmetic
    # (reassociation only).  MEASURED NET-NEGATIVE on TPU v5e at Amazon-Baby
    # scale (15.2 vs 10.0 ms/step): the replaced GEMMs already ran at MXU
    # peak (~1.1 ms total), while the correction's W1-row gather
    # materializes [B, max_deg, H] rank-3 intermediates (~1.4 ms) and the
    # D-step W1 cotangent becomes a [B*max_deg, H]-row scatter-add into the
    # [n_items, H] layer (~2.6 ms) — see docs/performance.md.  'auto'
    # therefore resolves to 'off'; 'on' is available for experimentation
    # (requires no duplicate per-user train items — the correction subtracts
    # once per entry while the interaction mask is idempotent).
    disc_lowrank: str = "auto"  # auto (= off) | on | off
    # Batch the D step's fake + real towers through ONE first-layer GEMM
    # ([(M+1)B, n_items] x [n_items, n_items/4] forward and one dW1 cotangent
    # GEMM instead of two of each); BatchNorm statistics are computed after
    # the split, so numerics equal the separate towers (equality-tested).
    # Measured NEGATIVE at Amazon-Sports scale (54.4 vs 53.6 ms/step): the
    # separate l1 GEMMs already run at MXU peak and the concat materializes
    # an extra [(M+1)B, n_items] copy — docs/performance.md, round-3 pass.
    disc_fused_l1: bool = False
    # Activation storage dtype INSIDE the WGAN-GP tower (models/mmssl.
    # discriminator_tower act_dtype).  Cotangent dtypes follow primal dtypes
    # under autodiff, so "bfloat16" makes the GP tower's backward and
    # second-order dots run bf16 x bf16 — the mixed-precision lever that is
    # legal on a twice-differentiated path (custom-VJP cotangent casts are
    # not).  "float32" is the parity default; the first-order towers always
    # keep f32 activations (bf16 there measured slower — fusion breakage).
    gp_act_dtype: str = "float32"


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + adversarial/contrastive loop hyperparameters."""

    epochs: int = 1000  # parser.py:53
    lr: float = 5.5e-4  # parser.py:65
    d_lr: float = 3e-4  # parser.py:56
    d_betas: tuple[float, float] = (0.5, 0.9)  # main.py:74
    # Storage dtype of the discriminator Adam moments ("float32" matches the
    # reference exactly; "bfloat16" halves the optimizer-state HBM traffic of
    # the biggest update fusion of the step — see train/optim.py).
    d_moment_dtype: str = "float32"
    # Storage dtype of the discriminator TOWER weights (l1/l2/l3; BatchNorm
    # params stay f32).  "bfloat16" halves the 50 MB (Baby) / 337 MB
    # (Sports) l1 layer's parameter read+write in the Adam update fusion and
    # its operand reads in every tower pass.  Unlike the moments, this
    # rounds the WEIGHTS themselves each step (~3 decimal digits) — a real
    # numerics change, gated by the quality protocol; measurement in
    # docs/performance.md.  f32 default (reference parity).
    d_param_dtype: str = "float32"
    # Share ONE modality-dropout draw between the per-batch D-step and
    # G-step forwards (the reference runs two independent draws,
    # MMSSL/main.py:339/363).  The fused forward then propagates a
    # [d + M*d]-wide stack instead of [d + 2*M*d], cutting the dominant
    # graph-engine GEMM width ~40% at Baby scale.  A real distributional
    # change (the discriminator scores fake rows built from the exact
    # draw the generator trains on that step), gated by the quality
    # protocol like d_param_dtype; measurement in docs/performance.md.
    # False default (reference parity).
    shared_fwd_draw: bool = False
    # PRNG implementation for the training key ("threefry2x32" is JAX's
    # counter-based default; "rbg" lowers to the TPU-native RngBitGenerator
    # and removes ~2.2 ms/step of in-fusion threefry at Amazon-Baby scale —
    # the dropout masks/Gumbel noise draw the same distributions from a
    # different stream).  Threaded from ONE root key, so either choice is
    # fully deterministic given the seed.
    prng_impl: str = "threefry2x32"
    decay: float = 1e-5  # regs[0], parser.py:64
    feat_reg_decay: float = 1e-5  # parser.py:29
    cl_rate: float = 0.03  # parser.py:60
    cl_tau: float = 0.5  # parser.py:94
    g_rate: float = 1e-4  # parser.py:83 --G_rate
    gp_rate: float = 1.0  # parser.py:86
    gp_lambda: float = 0.3  # main.py:142
    # Gumbel softening of "real" rows for the discriminator (main.py:349-352).
    real_data_tau: float = 0.005  # parser.py:88
    ui_pre_scale: float = 100.0  # parser.py:89
    log_log_scale: float = 1e-5  # parser.py:99
    # Adjacency densification cadence (main.py:378-405).
    densify_period: int = 1  # parser.py:93 --T
    m_topk_rate: float = 1e-4  # parser.py:98
    # LATTICE/MICRO single-optimizer loop.
    # MICRO --loss_ratio (contrastive-task weight applied to the summed
    # per-modality InfoNCE, MICRO/codes/main.py:103; parser.py:44 default).
    loss_ratio: float = 0.03
    # MICRO full-catalog InfoNCE schedule knobs (round-5 attribution found
    # the 2 CL calls are ~44% of the step — docs/performance.md):
    # cl_remat: wrap each call in jax.checkpoint (recompute the [N, N] exp
    # blocks in the VJP instead of storing 2·N² per call); numerics
    # identical either way.  cl_batched: vmap the per-modality calls into
    # one batched GEMM family sharing the fusion operand (same per-element
    # math).
    cl_remat: bool = True
    cl_batched: bool = False
    lr_decay_base: float = 0.96  # 0.96 ** (epoch / 50), main.py:85
    lr_decay_interval: float = 50.0
    early_stopping_patience: int = 7  # parser.py:11
    seed: int = 2022  # parser.py:51
    # Eval cadence in epochs (reference evaluates every epoch).
    eval_every: int = 1
    # Host-sync cadence in batches: fetch one scalar every N steps to bound
    # the device dispatch queue (the axon relay degrades badly past ~8
    # queued donated-state steps) while amortizing the ~29 ms roundtrip.
    sync_every: int = 4
    # Train steps fused into one lax.scan dispatch with on-device sampling
    # (steps_*.py *_train_epoch). 0 = one dispatch per batch with the host
    # sampler.  On relay-attached TPUs every host roundtrip costs ~40 ms, so
    # fusing an epoch's batches into one program removes most of the
    # end-to-end step cost; the sampling distribution is identical
    # (data/sampler_device.py).  fit() bends the actual chunk length to
    # minimize the per-batch epoch tail (Trainer._effective_spd).  Default
    # 128 (round 4; was 64, before that 32 — each doubling halves the
    # ~29 ms per-chunk dispatch+fetch overhead): whole-epoch 105-step
    # chunks measure 7.95 vs 8.12 ms/step at Amazon-Baby scale, and a
    # 128 cap lets Baby-class epochs fuse into ONE dispatch under
    # _effective_spd (lax.scan compile time is length-independent).
    steps_per_dispatch: int = 128
    # Rematerialize the fused forward in the generator VJP (jax.checkpoint):
    # trades one extra forward's FLOPs for dropping its residuals, for
    # catalogs where [n_users, (1+2M)d] activations pressure HBM.
    remat: bool = False
    checkpoint_dir: str = ""
    checkpoint_every: int = 0  # epochs; 0 = disabled
    log_every_steps: int = 0  # 0 = per-epoch only


@dataclass(frozen=True)
class EvalConfig:
    """Ranking evaluation protocol (MMSSL/utility/batch_test.py:112-169)."""

    ks: tuple[int, ...] = (10, 20, 50)  # parser.py:63
    # User rows scored per device step; reference uses 2*batch_size.
    user_batch_size: int = 2048
    # 'part' -> heap top-K only (auc = 0, Q12); 'full' -> also AUC.
    test_flag: str = "part"


@dataclass(frozen=True)
class ShardingConfig:
    """Device mesh layout. The reference is single-GPU (SURVEY.md §2.4); this
    is net-new TPU design: data-parallel batch axis + model axis for
    row-sharded tables and catalog-sharded scoring."""

    data_axis: str = "data"
    model_axis: str = "model"
    # Mesh shape; () = single device, (-1,) = all devices on the data axis.
    mesh_shape: tuple[int, ...] = ()


@dataclass(frozen=True)
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)
    parity: ParityConfig = field(default_factory=ParityConfig)

    def replace(self, **kw: Any) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _nested_replace(cfg: ExperimentConfig, updates: Mapping[str, Any]) -> ExperimentConfig:
    """Apply {'train.lr': 1e-3, ...} style dotted updates."""
    out = cfg
    for key, value in updates.items():
        parts = key.split(".")
        if len(parts) == 1:
            out = dataclasses.replace(out, **{parts[0]: value})
        elif len(parts) == 2:
            sub = getattr(out, parts[0])
            out = dataclasses.replace(out, **{parts[0]: dataclasses.replace(sub, **{parts[1]: value})})
        else:
            raise KeyError(f"unsupported config key: {key}")
    return out


# Per-dataset presets. Scale numbers from the reference README table
# (README.md:40-47); modality dims per dataset.
_PRESETS: dict[str, dict[str, Any]] = {
    "baby": {"data.modalities": ("image", "text")},
    "sports": {"data.modalities": ("image", "text")},
    "allrecipes": {"data.modalities": ("image", "text")},
    "clothing": {"data.modalities": ("image", "text")},
    # Tiktok ships visual/acoustic/text features (README.md:44); the reference
    # code only consumes image+text (MMSSL/main.py:54-55) but our model zoo is
    # N-modality, so the preset is tri-modal.
    "tiktok": {"data.modalities": ("image", "audio", "text")},
    "netflix": {"data.modalities": ("image", "text")},
    "movielens": {"data.modalities": ("image", "text")},
}


# Per-model defaults where the baseline codebases' parsers diverge from
# MMSSL's: LATTICE/MICRO train with lr=5e-4 and seed=123
# (LATTICE/codes/utility/parser.py:22,16; MICRO/codes/utility/parser.py);
# MMSSL uses lr=5.5e-4, seed=2022 (MMSSL/utility/parser.py:65,51).
_MODEL_PRESETS: dict[str, dict[str, Any]] = {
    "lattice": {"train.lr": 5e-4, "train.seed": 123},
    "micro": {"train.lr": 5e-4, "train.seed": 123},
}


def preset(dataset: str, model: str = "mmssl", **overrides: Any) -> ExperimentConfig:
    """Build an ExperimentConfig for a named dataset + model (explicit
    overrides win over model presets, which win over dataset presets)."""
    cfg = ExperimentConfig()
    cfg = _nested_replace(cfg, {"data.dataset": dataset, "model.name": model})
    if dataset in _PRESETS:
        cfg = _nested_replace(cfg, _PRESETS[dataset])
    if model in _MODEL_PRESETS:
        cfg = _nested_replace(cfg, _MODEL_PRESETS[model])
    if overrides:
        cfg = _nested_replace(cfg, overrides)
    return cfg


def flatten(cfg: ExperimentConfig) -> dict[str, Any]:
    """Dotted-key view for logging."""
    out: dict[str, Any] = {}
    for f in dataclasses.fields(cfg):
        sub = getattr(cfg, f.name)
        if dataclasses.is_dataclass(sub):
            for sf in dataclasses.fields(sub):
                out[f"{f.name}.{sf.name}"] = getattr(sub, sf.name)
        else:
            out[f.name] = sub
    return out
