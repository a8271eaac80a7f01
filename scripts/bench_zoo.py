"""Benchmark: train-step throughput for the whole model zoo.

Runs each baseline model's fused train path at Amazon-Baby scale (the same
synthetic dataset as bench.py) plus the flagship MMSSL at Tiktok scale
(tri-modal, 9,319 x 6,710, V/A 128-d + T 768-d — reference README.md:40-47)
on the real TPU chip.  Prints one JSON line PER model:

  {"model": ..., "metric": "train_examples_per_sec", "value": N, ...}

bench.py stays the driver's single-line flagship benchmark; this script is
the documentation table generator (docs/performance.md).

Usage: python scripts/bench_zoo.py [model ...]   (default: all)
"""

import json
import os
import sys
import time

import jax

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# CPU backend alongside the TPU for the MFU fields (see bench.py / utils/flops).
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    jax.config.update("jax_platforms", _plat + ",cpu")
sys.path.insert(0, _ROOT)

import jax.numpy as jnp
import numpy as np

TIKTOK = {"n_users": 9_319, "n_items": 6_710, "dims": {"image": 128, "audio": 128, "text": 768}}
SPORTS = {"n_users": 35_598, "n_items": 18_357, "dims": {"image": 4096, "text": 1024}}
# The reference's 4th published dataset geometry (README.md:40-47): wide
# visual (2048) against a NEAR-DEGENERATE 20-d text modality.
ALLRECIPES = {"n_users": 19_805, "n_items": 10_067, "dims": {"image": 2048, "text": 20}}
# Netflix-class large-catalog regime (VERDICT r4 Missing #3): the reference
# actively distributes a Netflix multimodal dataset (README.md:59-106) but
# publishes no geometry; this is ~2x Sports on both axes with Sports' feature
# widths.  The discriminator's O(n_items^2/4) first layer
# (reference MMSSL/Models.py:224-245) and the per-modality dense graph stacks
# are the tensors that blow up first — the knob matrix (graph_dtype,
# d_param_dtype, remat) is measured here (docs/performance.md large-catalog
# section).
NETFLIX = {"n_users": 70_000, "n_items": 40_000, "dims": {"image": 4096, "text": 1024}}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synth_dataset(name: str, spec: dict):
    from mmssl_tpu.config import DataConfig
    from mmssl_tpu.data import load_dataset, write_synthetic_dataset

    root = os.path.join(_ROOT, ".bench_data")
    marker = os.path.join(root, name, "train.json")
    if not os.path.exists(marker):
        log(f"bench_zoo: generating {name} synthetic dataset (one-time)...")
        write_synthetic_dataset(
            root, name,
            n_users=spec["n_users"], n_items=spec["n_items"], n_clusters=32,
            interactions_per_user=(3, 10), modality_dims=spec["dims"], seed=0,
        )
    return load_dataset(DataConfig(data_path=root, dataset=name, batch_size=1024))


def build_trainer(name: str):
    """Construct the benchmarked Trainer for a zoo entry (shared with
    scripts/profile_step.py so profiles measure exactly the benched program).

    Returns (trainer, steps_per_dispatch, batch_size)."""
    import bench
    from mmssl_tpu.config import preset
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger
    import dataclasses

    scales = {
        "mmssl_tiktok": ("tiktok", "tiktok_scale", TIKTOK),
        "mmssl_sports": ("sports", "sports_scale", SPORTS),
        "mmssl_allrecipes": ("allrecipes", "allrecipes_scale", ALLRECIPES),
        "mmssl_netflix": ("netflix", "netflix_scale", NETFLIX),
    }
    scaled = scales.get(name)
    model = "mmssl" if scaled else name
    if scaled:
        preset_name, dsname, spec = scaled
        ds = synth_dataset(dsname, spec)
        dims = spec["dims"]
    else:
        ds = bench.get_dataset()
        dims = bench.FEAT_DIMS
        dsname = "baby_scale"
    cfg = dataclasses.replace(
        bench.get_config(),
        model=dataclasses.replace(
            bench.get_config().model,
            name=model,
            # MICRO fast path: dense laplacian modality graphs (MXU) instead
            # of the COO scatter default (--sparse 0 branch; identical math).
            micro_sparse=False,
        ),
    )
    if scaled:
        cfg = preset(preset_name, "mmssl", **{
            "data.data_path": os.path.join(_ROOT, ".bench_data"),
            "data.dataset": dsname,
            "data.batch_size": 1024,
            # Netflix-class: the dense fast path cannot fit one chip (the
            # HBM guard refuses it by calibration — docs/performance.md
            # large-catalog matrix); default this entry to the measured
            # single-chip-feasible coo config instead.
            "model.graph_impl": "coo" if name == "mmssl_netflix" else "dense",
            "model.graph_dtype": "int8",
            "model.compute_dtype": "bfloat16",
            "train.d_moment_dtype": "bfloat16",
            "train.d_param_dtype": "bfloat16",
            "train.shared_fwd_draw": True,
            "train.prng_impl": "rbg",
        })
    # Ad-hoc experiment overrides, e.g.
    #   MMSSL_BENCH_OVERRIDES="model.disc_lowrank=on" python scripts/bench_zoo.py mmssl_sports
    # (same typed dotted-key parser as the CLI's --set).
    ov = os.environ.get("MMSSL_BENCH_OVERRIDES", "")
    if ov:
        from mmssl_tpu.cli.main import _parse_overrides
        from mmssl_tpu.config import _nested_replace

        cfg = _nested_replace(cfg, _parse_overrides(ov.split(",")))
        log(f"bench_zoo[{name}]: overrides {ov}")
    # Features on device (relay uploads are ~1.2 MB/s; timing is content-free).
    key = jax.random.key(0)
    for i, (m, dim) in enumerate(dims.items()):
        ds.feats[m] = jax.random.normal(jax.random.fold_in(key, i), (ds.n_items, dim), jnp.float32)
    # MMSSL_BENCH_MESH="1x1" runs the SPMD program (sharded step + mesh-placed
    # state) instead of the unsharded one — the overhead-vs-unsharded probe.
    mesh = None
    mspec = os.environ.get("MMSSL_BENCH_MESH", "")
    if mspec:
        from mmssl_tpu.parallel.mesh import make_mesh

        d, _, m = mspec.partition("x")
        mesh = make_mesh(mesh_shape=(int(d), int(m or 1)))
        log(f"bench_zoo[{name}]: mesh {mspec}")
    tr = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True), mesh=mesh)
    return tr, max(cfg.train.steps_per_dispatch, 1), cfg.data.batch_size


def bench_model(name: str) -> dict:
    tr, spd, B = build_trainer(name)
    dsname = tr.cfg.data.dataset

    t0 = time.time()
    _ = float(np.asarray(tr.train_chunk(0, spd))[-1, 0])
    log(f"bench_zoo[{name}]: warmup chunk 1 (incl. compile) {time.time()-t0:.1f}s")
    t0 = time.time()
    _ = float(np.asarray(tr.train_chunk(spd, spd))[-1, 0])
    log(f"bench_zoo[{name}]: warmup chunk 2 {time.time()-t0:.1f}s")

    steps = max(64 // spd, 1) * spd
    t0 = time.time()
    for c in range(steps // spd):
        _ = float(np.asarray(tr.train_chunk((c + 2) * spd, spd))[-1, 0])
    dt = time.time() - t0
    ms = dt / steps * 1e3
    log(f"bench_zoo[{name}]: {steps} steps in {dt:.2f}s -> {ms:.1f} ms/step")
    from mmssl_tpu.utils.flops import mfu_fields, train_step_flops

    flops = train_step_flops(tr)
    return {
        "model": name, "dataset": dsname, "metric": "train_examples_per_sec",
        "value": round(steps * B / dt, 1), "unit": "examples/s",
        "ms_per_step": round(ms, 2),
        **mfu_fields(flops, dt / steps),
        "multichip": "dryrun-only",
    }


def main():
    models = sys.argv[1:] or ["mf", "lightgcn", "ngcf", "lattice", "micro", "mmssl_tiktok"]
    for name in models:
        try:
            print(json.dumps(bench_model(name)), flush=True)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"model": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
