"""Command-line entrypoint.

Replaces the reference's ``python main.py --dataset X`` (MMSSL/main.py:
528-536) with subcommands over the typed config:

  python -m mmssl_tpu.cli train --dataset baby --model mmssl --data-path D
  python -m mmssl_tpu.cli eval  --dataset baby --model mmssl --data-path D --checkpoint-dir C
  python -m mmssl_tpu.cli recommend --dataset baby --model mmssl --data-path D \
      --checkpoint-dir C --users 1,2,3 --top-k 20
  python -m mmssl_tpu.cli synth --out D --name demo --users 500 --items 200

Arbitrary config overrides ride ``--set key=value`` (dotted keys, python
literals), e.g. ``--set train.lr=1e-3 --set model.n_ui_layers=3`` — without
the reference's ``eval()``-on-argparse-strings pattern (SURVEY.md §5.6).
"""

from __future__ import annotations

import argparse
import ast
import json
import sys
from typing import Any, Dict

from mmssl_tpu.config import ExperimentConfig, flatten, preset


def _parse_overrides(pairs) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for pair in pairs or []:
        key, _, raw = pair.partition("=")
        if not _:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        try:
            out[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            out[key] = raw  # plain string
    return out


def _build_cfg(args) -> ExperimentConfig:
    overrides = _parse_overrides(args.set)
    overrides.setdefault("data.data_path", args.data_path)
    if getattr(args, "epochs", None) is not None:
        overrides["train.epochs"] = args.epochs
    if getattr(args, "checkpoint_dir", None):
        overrides["train.checkpoint_dir"] = args.checkpoint_dir
    return preset(args.dataset, args.model, **overrides)


def _build_mesh(args):
    """--mesh '' -> None (single device); 'auto' -> all devices; 'DxM' ->
    explicit (data, model) split.  --distributed runs multi-host bring-up
    first so the mesh spans every host's devices."""
    if getattr(args, "distributed", False):
        from mmssl_tpu.parallel.multihost import initialize

        initialize()
    spec = getattr(args, "mesh", "") or ""
    if not spec:
        return None
    from mmssl_tpu.parallel.mesh import make_mesh

    if spec == "auto":
        return make_mesh()
    d, _, m = spec.partition("x")
    if not d.isdigit() or (m and not m.isdigit()):
        raise SystemExit(
            f"--mesh expects 'auto' or 'DxM' (data x model, e.g. 4x2); got {spec!r}"
        )
    return make_mesh(mesh_shape=(int(d), int(m or 1)))


def cmd_train(args) -> int:
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger

    cfg = _build_cfg(args)
    mesh = _build_mesh(args)
    logger = MetricLogger(name=f"{cfg.model.name}-{cfg.data.dataset}", path=args.log_file)
    logger.log(event="config", **{k: v for k, v in flatten(cfg).items()})
    trainer = Trainer(cfg, logger=logger, mesh=mesh)
    if args.resume and trainer.ckpt is not None and trainer.ckpt.latest_step() is not None:
        extra = trainer.resume()
        logger.log(event="resumed", **extra)
    result = trainer.fit()
    summary = {
        "best_val_recall": result.best_val_recall,
        "best_epoch": result.best_epoch,
        "epochs_run": result.epochs_run,
        "train_time_s": round(result.train_time_s, 1),
        "test": {k: [float(x) for x in v] if hasattr(v, "__len__") else float(v)
                 for k, v in result.test_metrics.items()},
    }
    print(json.dumps(summary))
    return 0


def cmd_eval(args) -> int:
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger

    cfg = _build_cfg(args)
    trainer = Trainer(cfg, logger=MetricLogger(quiet=True), mesh=_build_mesh(args))
    if args.checkpoint_dir:
        trainer.resume()
    res = trainer.evaluate(args.split)
    print(json.dumps({k: [float(x) for x in v] if hasattr(v, "__len__") else float(v)
                      for k, v in res.items()}))
    return 0


def cmd_recommend(args) -> int:
    """Serve top-k recommendations from a (checkpoint-restored) model, or
    export the materialized embedding tables for an external ANN stack."""
    from mmssl_tpu.serve import RecommendEngine
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger

    cfg = _build_cfg(args)
    trainer = Trainer(cfg, logger=MetricLogger(quiet=True), mesh=_build_mesh(args))
    if args.checkpoint_dir:
        trainer.resume()
    engine = RecommendEngine.from_trainer(trainer, topk_impl=getattr(args, "topk_impl", "exact"))
    if args.export:
        paths = engine.export_embeddings(args.export)
        print(json.dumps({"exported": paths}))
        return 0
    if args.users:
        users = [int(u) for u in args.users.split(",")]
        ids, scores = engine.recommend(users, k=args.top_k,
                                       exclude_train=not args.include_train)
    else:
        # Full-user-base batch job: the fused offline path (one scanned
        # dispatch + one packed fetch, ~10x the request loop on a
        # relay-attached chip — serve/engine.recommend_all).
        users = list(range(trainer.ds.n_users))
        ids, scores = engine.recommend_all(k=args.top_k,
                                           exclude_train=not args.include_train)
    out = sys.stdout if not args.out else open(args.out, "w")
    try:
        for n, u in enumerate(users):
            out.write(json.dumps({
                "user": u,
                "items": [int(x) for x in ids[n]],
                "scores": [round(float(x), 6) for x in scores[n]],
            }) + "\n")
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


def cmd_synth(args) -> int:
    from mmssl_tpu.data.synthetic import write_synthetic_dataset

    path = write_synthetic_dataset(
        args.out, args.name, n_users=args.users, n_items=args.items, seed=args.seed
    )
    print(json.dumps({"path": path}))
    return 0


def _configure_jax(platform: str) -> None:
    import os

    import jax

    # Persistent compilation cache: remote TPU compiles through the axon
    # relay are slow (minutes for the big train steps); cache them.  CPU
    # runs must NOT use it: XLA:CPU serializes AOT code specialized to the
    # build host's machine features, and loading an entry whose features
    # mismatch the current host is a hard abort (observed: a cached
    # +prefer-no-scatter entry killing the whole process) — and CPU
    # compiles are fast anyway.
    on_cpu = (
        platform == "cpu"
        or "cpu" in os.environ.get("JAX_PLATFORMS", "").lower()
        or "cpu" in str(jax.config.jax_platforms or "").lower()
    )
    if not on_cpu:
        cache = os.environ.get("MMSSL_TPU_JAX_CACHE", os.path.expanduser("~/.cache/mmssl_tpu_jax"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if platform != "default":
        # Must win over the container sitecustomize pinning the TPU plugin.
        jax.config.update("jax_platforms", platform)
    # Virtual CPU devices for exercising --mesh without TPUs (XLA_FLAGS is
    # too late when the environment pre-imports jax; the config knob is not).
    n_cpu = os.environ.get("MMSSL_TPU_CPU_DEVICES", "")
    if n_cpu and on_cpu:
        jax.config.update("jax_num_cpu_devices", int(n_cpu))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mmssl_tpu")
    p.add_argument(
        "--platform", default="default", choices=["default", "cpu", "tpu"],
        help="force a jax platform (default: whatever the environment provides)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--dataset", required=True)
        sp.add_argument("--model", default="mmssl", choices=["mmssl", "lattice", "micro", "lightgcn", "ngcf", "mf"])
        sp.add_argument("--data-path", required=True)
        sp.add_argument("--checkpoint-dir", default="")
        sp.add_argument("--set", action="append", metavar="KEY=VALUE")
        sp.add_argument(
            "--mesh", default="",
            help="SPMD device mesh: 'auto' (all local devices, square-ish "
                 "data x model split), 'DxM' (e.g. 4x2), or empty for "
                 "single-device execution",
        )
        sp.add_argument(
            "--distributed", action="store_true",
            help="multi-host: jax.distributed.initialize before building the "
                 "mesh (coordinator from --set-able env MMSSL_TPU_COORDINATOR "
                 "or the TPU pod runtime); the mesh then spans all hosts",
        )

    sp = sub.add_parser("train", help="train a model")
    common(sp)
    sp.add_argument("--epochs", type=int, default=None)
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--log-file", default=None)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval", help="evaluate (latest checkpoint or fresh init)")
    common(sp)
    sp.add_argument("--split", default="test", choices=["val", "test"])
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("recommend", help="top-k retrieval / embedding export")
    common(sp)
    sp.add_argument("--users", default="", help="comma-separated user ids (default: all users)")
    sp.add_argument("--top-k", type=int, default=20)
    sp.add_argument("--include-train", action="store_true",
                    help="do not exclude the user's train interactions")
    sp.add_argument("--out", default="", help="write JSONL here instead of stdout")
    sp.add_argument("--export", default="",
                    help="export user/item embedding tables (.npy + manifest) to this dir and exit")
    sp.add_argument("--topk-impl", default="exact", choices=["exact", "approx"],
                    help="retrieval kernel: exact lax.top_k (reference protocol) or "
                         "TPU-native lax.approx_max_k (recall_target 0.95)")
    sp.set_defaults(fn=cmd_recommend)

    sp = sub.add_parser("synth", help="generate a synthetic dataset")
    sp.add_argument("--out", required=True)
    sp.add_argument("--name", default="synthetic")
    sp.add_argument("--users", type=int, default=500)
    sp.add_argument("--items", type=int, default=200)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    _configure_jax(args.platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
