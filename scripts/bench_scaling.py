"""Day-one multi-chip scaling benchmark (VERDICT r3 #5; SURVEY.md §2.5/§5.8).

This container exposes ONE physical chip, so cross-chip scaling cannot be
MEASURED here — but when real multi-chip hardware appears, the scaling
number must be one command with zero new code.  This script is that
command.  Run one copy per process:

  # TPU pod slice (process count/id auto-detected from the TPU runtime):
  MMSSL_TPU_COORDINATOR=host0:8476 python scripts/bench_scaling.py

  # manual cluster (CPU/GPU hosts):
  MMSSL_TPU_COORDINATOR=host0:8476 MMSSL_TPU_NUM_PROCESSES=4 \
  MMSSL_TPU_PROCESS_ID=$i python scripts/bench_scaling.py

  # single-process sanity run (any device count):
  python scripts/bench_scaling.py --mesh 4x2 --platform cpu --cpu-devices 8

It brings up ``jax.distributed`` from the MMSSL_TPU_* env vars
(parallel/multihost.initialize — the same path the CLI's ``--distributed``
uses), builds the (data, model) mesh over ALL global devices, runs the
fused sharded MMSSL epoch (lax.scan + on-device sampling, the production
dispatch shape) and the catalog-sharded eval, and prints ONE JSON line
(process 0) with:

  - step_ms / examples_per_s / examples_per_s_per_chip
  - eval_users_per_s (one fused dispatch per split)
  - dp_step_ms + model_axis_overhead_pct: the same program re-timed on the
    pure-DP (P, 1) layout isolates what the model-axis sharding+collectives
    cost at this scale (timing-delta attribution: the relay/profile path is
    not available on every deployment)
  - scaling_efficiency_vs_single_chip vs the >=80% BASELINE.md target, when
    ``--single-chip-ms`` (bench.py's ms_per_step on one chip) is given:
    efficiency = single_chip_ms / (step_ms * n_devices) at the fixed global
    batch (strong scaling).

Smoke-tested in-suite as a REAL 2-process CPU cluster
(tests/test_multiprocess.py::test_bench_scaling_two_process_smoke).
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="baby_scale",
                    help="dataset name (default: bench.py's Baby-scale synthetic)")
    ap.add_argument("--data-path", default=os.path.join(_ROOT, ".bench_data"))
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--embed", type=int, default=0,
                    help="override model.embed_size (0 = preset default)")
    ap.add_argument("--mesh", default="auto",
                    help="'DxM' over all global devices, or 'auto' (all-data)")
    ap.add_argument("--steps", type=int, default=64,
                    help="timed steps (also the fused-chunk length)")
    ap.add_argument("--platform", default="default", choices=["default", "cpu"])
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force N local virtual CPU devices (with --platform cpu)")
    ap.add_argument("--single-chip-ms", type=float, default=None,
                    help="bench.py ms_per_step on ONE chip, for the efficiency ratio")
    ap.add_argument("--no-dp-probe", action="store_true",
                    help="skip the pure-DP (P,1) comparison run")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        if args.cpu_devices:
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from mmssl_tpu.parallel import multihost

    multihost.initialize()  # env-driven; no-op when single-process
    n_proc, n_dev = jax.process_count(), jax.device_count()
    log(f"bench_scaling: {n_proc} process(es), {n_dev} global device(s)")

    import jax.numpy as jnp
    import numpy as np

    from mmssl_tpu.config import preset
    from mmssl_tpu.data.dataset import load_dataset
    from mmssl_tpu.parallel.mesh import make_mesh
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger

    if args.mesh == "auto":
        shape = (n_dev, 1)
    else:
        d, m = args.mesh.lower().split("x")
        shape = (int(d), int(m))
    assert shape[0] * shape[1] == n_dev, (shape, n_dev)

    overrides = {
        "data.data_path": args.data_path,
        "data.batch_size": args.batch,
        "model.graph_impl": "dense",
        "model.graph_dtype": "int8",
        "model.compute_dtype": "bfloat16",
        "train.d_moment_dtype": "bfloat16",
        "train.d_param_dtype": "bfloat16",
        "train.prng_impl": "rbg",
    }
    if args.embed:
        overrides["model.embed_size"] = args.embed
    if args.dataset == "baby_scale" and not os.path.exists(
        os.path.join(args.data_path, "baby_scale", "train.json")
    ):
        # One-time synthetic generation, process 0 writes, others wait.
        if multihost.is_primary():
            import bench

            bench.get_dataset()
        if n_proc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("bench_scaling_dataset")
    cfg = preset(args.dataset, "mmssl", **overrides)
    ds = load_dataset(cfg.data)
    if args.dataset == "baby_scale":
        # Feature CONTENT does not affect step time; generate on device to
        # avoid shipping 143 MB through a relay (see bench.py).
        key = jax.random.key(0)
        for i, m in enumerate(sorted(ds.feats)):
            dim = ds.feats[m].shape[1]
            ds.feats[m] = jax.random.normal(
                jax.random.fold_in(key, i), (ds.n_items, dim), jnp.float32
            )

    def timed_run(mesh_shape):
        mesh = make_mesh(n_dev, mesh_shape=mesh_shape)
        tr = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True), mesh=mesh)
        spd = args.steps
        t0 = time.time()
        m = tr.train_chunk(0, spd)
        float(np.asarray(m)[-1, 0])  # sync by fetching (relay-safe)
        log(f"bench_scaling[{mesh_shape}]: warmup chunk 1 {time.time() - t0:.1f}s")
        t0 = time.time()
        m = tr.train_chunk(spd, spd)
        float(np.asarray(m)[-1, 0])
        log(f"bench_scaling[{mesh_shape}]: warmup chunk 2 {time.time() - t0:.1f}s")
        t0 = time.time()
        m = tr.train_chunk(2 * spd, spd)
        float(np.asarray(m)[-1, 0])
        step_ms = (time.time() - t0) / spd * 1000.0
        # Sharded eval: the whole val split as one dispatch + one fetch.
        # Warm (compile) OUTSIDE the timed region — on a cold cache the
        # first compile through a relay can take minutes.
        n_eval_users = len(tr.evaluator._splits["val"][2])
        t0 = time.time()
        _ = float(np.asarray(tr.evaluate("val")["recall"]).reshape(-1)[0])
        log(f"bench_scaling[{mesh_shape}]: eval warmup {time.time() - t0:.1f}s")
        t0 = time.time()
        val = tr.evaluate("val")
        _ = float(np.asarray(val["recall"]).reshape(-1)[0])
        eval_s = time.time() - t0
        return step_ms, (n_eval_users / eval_s if eval_s > 0 else None)

    step_ms, eval_ups = timed_run(shape)
    dp_step_ms = None
    if shape[1] > 1 and not args.no_dp_probe:
        dp_step_ms, _ = timed_run((n_dev, 1))

    out = {
        "metric": "scaling",
        "n_processes": n_proc,
        "n_devices": n_dev,
        "mesh": f"{shape[0]}x{shape[1]}",
        "batch": args.batch,
        "step_ms": round(step_ms, 3),
        "examples_per_s": round(args.batch / step_ms * 1000.0, 1),
        "examples_per_s_per_chip": round(args.batch / step_ms * 1000.0 / n_dev, 1),
        "eval_users_per_s": round(eval_ups, 1) if eval_ups else None,
        "dp_step_ms": round(dp_step_ms, 3) if dp_step_ms else None,
        "model_axis_overhead_pct": (
            round(100.0 * (step_ms - dp_step_ms) / dp_step_ms, 2) if dp_step_ms else None
        ),
        "scaling_efficiency_vs_single_chip": (
            round(args.single_chip_ms / (step_ms * n_dev), 3)
            if args.single_chip_ms else None
        ),
        "target_efficiency": 0.8,  # BASELINE.md >=80% at pod-slice scale
    }
    if multihost.is_primary():
        print(json.dumps(out), flush=True)
    else:  # every process prints to stderr for cross-checking
        log(json.dumps(out))


if __name__ == "__main__":
    main()
