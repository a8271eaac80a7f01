"""Device-memory (HBM) budget estimation for large-catalog configs.

The reference never runs beyond Sports scale (35,598 x 18,357) and simply
OOMs past it; the first tensors to blow up at Netflix-class catalogs are the
discriminator's O(n_items^2/4) first layer (reference MMSSL/Models.py:224-245
— [n_items, n_items/4] dense) and, in dense graph mode, the per-direction
[n_users, n_items] interaction matrices.  This module prices the resident
state and the dominant transients from the config + geometry BEFORE any
compile, so a config that cannot fit is refused/diagnosed in seconds with
the knobs that would make it fit (graph_dtype='bit', d_param_dtype=bfloat16,
train.remat) instead of failing after a 10-minute XLA compile.

Estimates are simple sums of the big arrays plus a fragmentation-calibrated
transient term; small weights, scalars, and fusion temporaries are ignored.
CALIBRATED against the measured Netflix-scale matrix: the four dense/coo ×
batch verdicts (two OOMs, two successful runs) are all reproduced — see
docs/performance.md, large-catalog section, and the FRAG note below.
"""

from __future__ import annotations

from typing import Dict, Mapping

GIB = 1024**3

_DTYPE_BYTES = {
    "float32": 4.0, "f32": 4.0, "": 4.0, None: 4.0,
    "bfloat16": 2.0, "bf16": 2.0,
    "float16": 2.0,
    "int8": 1.0,
    "bit": 1.0 / 8.0,
}


def _bytes(dtype) -> float:
    return _DTYPE_BYTES.get(dtype if dtype is None else str(dtype), 4.0)


def estimate_mmssl_hbm(
    cfg,
    n_users: int,
    n_items: int,
    feat_dims: Mapping[str, int],
    n_batch: int = 1,
) -> Dict:
    """Estimated HBM footprint (bytes) of a flagship MMSSL training step.

    Returns ``{"components": {name: bytes}, "total_bytes": int,
    "suggestions": [str, ...]}`` — suggestions list the config knobs that
    shrink the largest components (what the large-catalog knob matrix in
    docs/performance.md measures)."""
    from mmssl_tpu.train.steps_mmssl import graph_capacity

    d = cfg.model.embed_size
    M = max(len(feat_dims), 1)
    B = cfg.data.batch_size
    comp_b = _bytes(cfg.model.compute_dtype)
    c: Dict[str, float] = {}

    # Interaction graphs (consts.ui/iu).  Dense mode: two [n_users, n_items]
    # blocks at graph_dtype; COO mode priced by nnz is typically far smaller
    # (<=0.1% dense) — the dense engine is the bench/production default.
    if cfg.model.graph_impl == "dense":
        g_b = _bytes(cfg.model.graph_dtype)
        c["graphs_dense(ui+iu)"] = 2.0 * n_users * n_items * g_b
        # int8 graphs are converted to the compute dtype for the MXU; at
        # large catalogs XLA materializes (at least) one full converted
        # direction as a temp — [n_users, n_items] at compute bytes.  This
        # is the component that makes dense infeasible at Netflix scale
        # even at batch 512 (measured OOM; docs/performance.md).
        if cfg.model.graph_dtype in ("int8", "bit"):
            c["graphs_mxu_convert"] = float(n_users) * n_items * comp_b

    # Discriminator tower at d_param_dtype (BN params are KBs, ignored).
    h1, h2 = max(n_items // 4, 1), max(n_items // 8, 1)
    d_n = n_items * h1 + h1 * h2 + h2
    dp_b = _bytes(cfg.train.d_param_dtype)
    c["d_tower_params"] = d_n * dp_b
    c["d_tower_moments(x2)"] = d_n * _bytes(cfg.train.d_moment_dtype) * 2.0
    # THREE l1-shaped cotangent buffers coexist (D-step grad, WGAN-GP
    # grad-of-grad, adversarial G path) — the top-3 allocations of the
    # measured Netflix-scale OOM dump were exactly three bf16[n_items, h1]
    # temps (764 MB each; docs/performance.md large-catalog section).
    c["d_tower_grads(transient)"] = d_n * dp_b * 3.0

    # Generator params + Adam moments (f32): tables + modality projectors.
    g_n = (n_users + n_items) * d + sum(fd * d for fd in feat_dims.values())
    c["gen_params+moments(x3)"] = g_n * 4.0 * 3.0

    # Modality features: stored f32 + a compute-dtype copy when casting.
    f_n = sum(n_items * fd for fd in feat_dims.values())
    c["feats_f32"] = f_n * 4.0
    if comp_b != 4.0:
        c["feats_compute_copy"] = f_n * comp_b

    # Densified COO buffers: rows/cols int32 + vals f32, 2 directions per
    # modality, plus the accumulation staging (rows+cols).
    cap = graph_capacity(cfg, n_items, n_batch)
    c["densify_buffers"] = M * (2 * cap * 12.0 + 2 * cap * 4.0)

    # Dominant transients: the fused propagation stack over the joint node
    # axis (x3: primal + VJP residual + cotangent), and the full-catalog
    # row blocks ([M*B, n_items] fake-row scores, D layer-1 activations and
    # their cotangents — observed f32 in the netflix OOM dump, ~6 live
    # copies across the D-step/GP/G-step paths).
    stack_cols = d + (1 if cfg.train.shared_fwd_draw else 2) * M * d
    c["fused_stack(transient)"] = (n_users + n_items) * stack_cols * comp_b * 3.0
    c["catalog_rows(transient)"] = (M * B) * (n_items + h1) * 4.0 * 4.0

    # XLA HLO-temp fragmentation: the measured netflix-scale program padded
    # 3.82 GiB of unpadded temps to 11.70 GiB (3.06x), but remat/liveness
    # keeps the true peak below the naive product.  FRAG=1.75 on the
    # transient components (together with graphs_mxu_convert above)
    # reproduces every measured verdict of the netflix matrix
    # (docs/performance.md): dense-int8 B=1024 estimates 21.5 GiB
    # (measured 19.9 GiB OOM -> refuse), dense B=512 20.1 (measured OOM ->
    # refuse), coo B=1024 11.0 (runs -> allow), coo B=2048 13.7 (runs at
    # 53.4% MFU -> allow), Sports dense 5.8 and Baby dense 1.5 (both run
    # -> allow).  Resident arguments do not fragment.
    FRAG = 1.75
    transient = [k for k in c if "transient" in k]
    for k in transient:
        c[k] = c[k] * FRAG
    total = int(sum(c.values()))
    suggestions = []
    if cfg.model.graph_impl == "dense":
        g_b = _bytes(cfg.model.graph_dtype)
        suggestions.append(
            f"model.graph_impl='coo' prices the interaction graphs at nnz "
            f"instead of n_users*n_items (frees "
            f"~{c['graphs_dense(ui+iu)'] / GIB:.1f} GiB) — the MEASURED "
            f"feasibility knob at Netflix-class catalogs: dense graphs OOM "
            f"on one chip there while coo runs at 47.6% MFU "
            f"(docs/performance.md large-catalog matrix)")
        if g_b > 1.0:
            suggestions.append(
                f"model.graph_dtype='int8' shrinks the dense interaction "
                f"graphs to 1 byte/entry (saves "
                f"~{c['graphs_dense(ui+iu)'] * (1 - 1.0 / g_b) / GIB:.1f} GiB; "
                f"'bit' is CF-joint-only — the MMSSL dense engine refuses it)")
    if dp_b > 2.0:
        suggestions.append(
            f"train.d_param_dtype='bfloat16' halves the O(n_items^2/4) "
            f"discriminator tower (saves ~{d_n * 2.0 / GIB:.1f} GiB)")
    if _bytes(cfg.train.d_moment_dtype) > 2.0:
        suggestions.append(
            f"train.d_moment_dtype='bfloat16' halves the D optimizer moments "
            f"(saves ~{d_n * 4.0 / GIB:.1f} GiB)")
    if not cfg.train.remat:
        suggestions.append(
            "train.remat=True drops the fused-stack VJP residuals for "
            "recompute (the right trade once activations no longer fit — "
            "measured NEGATIVE at small scales, docs/performance.md)")
    return {"components": {k: int(v) for k, v in c.items()},
            "total_bytes": total, "suggestions": suggestions}


def format_report(est: Dict, budget_bytes: float) -> str:
    lines = [
        f"estimated HBM footprint {est['total_bytes'] / GIB:.2f} GiB "
        f"vs budget {budget_bytes / GIB:.1f} GiB:"
    ]
    for name, b in sorted(est["components"].items(), key=lambda kv: -kv[1]):
        lines.append(f"  {b / GIB:8.2f} GiB  {name}")
    for s in est["suggestions"]:
        lines.append(f"  -> {s}")
    return "\n".join(lines)


def check_hbm_budget(cfg, n_users, n_items, feat_dims, n_batch, logger=None) -> Dict:
    """Estimate and, when the footprint cannot fit the chip, refuse with the
    full component/suggestion report (MMSSL_TPU_HBM_GB overrides the 16 GiB
    v5e default; 0 disables the check)."""
    import os

    est = estimate_mmssl_hbm(cfg, n_users, n_items, feat_dims, n_batch)
    budget = float(os.environ.get("MMSSL_TPU_HBM_GB", "16")) * GIB
    if budget <= 0:
        return est
    report = format_report(est, budget)
    if est["total_bytes"] > budget:
        raise MemoryError(
            "this config cannot fit the device HBM (the estimate counts only "
            "the big resident arrays + dominant transients, so exceeding the "
            "budget is a certain OOM).\n" + report
        )
    if est["total_bytes"] > 0.75 * budget and logger is not None:
        logger.log(event="hbm_budget_warning", detail=report)
    return est
