"""Cold-start compile audit (VERDICT r4 Weak #4 / next-round #4).

For a TPU framework whose perf story is dispatch cadence, time-to-first-step
is a first-class number: the flagship train step has been observed to compile
1-12 min cold on the relay-attached chip (23 min for MICRO variants).  This
script measures, per model, the bring-up timeline of ONE fit-shaped epoch:

  t_trainer   — Trainer construction (graph build, init, program wiring)
  t_first_chunk — first fused chunk dispatch -> fetched scalar (the
                  transition program's compile sits here)
  t_steady_chunk — the post-densification chunk (the SECOND big executable
                  cold fit() compiles; near-zero when the steady program was
                  already compiled)
  t_eval      — first evaluate('val') (eval forward + metric scan compile)
  n_compiles  — distinct XLA compilations observed (jax_log_compiles)

Each model runs in its OWN subprocess so in-process jit caches can't leak
between entries.  Modes:

  --cold   use a throwaway compilation-cache dir (true cold compile)
  (default) use the repo .jax_cache (warm persistent cache: the deploy-
           restart case — process-cold, cache-warm)

Prints one JSON line per (model, mode).  Results + the executable inventory
table live in docs/performance.md ("cold start" section).

Usage: python scripts/bench_coldstart.py [model ...] [--cold]
(models are bench_zoo entry names, so mmssl_sports / mmssl_netflix measure
the larger geometries)
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker():
    """Runs inside the per-model subprocess (MMSSL_COLDSTART_WORKER set)."""
    import logging

    model = os.environ["MMSSL_COLDSTART_MODEL"]
    cache_dir = os.environ["MMSSL_COLDSTART_CACHE"]

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _plat = os.environ.get("JAX_PLATFORMS", "")
    if _plat and "cpu" not in _plat:
        jax.config.update("jax_platforms", _plat + ",cpu")
    jax.config.update("jax_log_compiles", True)
    sys.path.insert(0, _ROOT)
    sys.path.insert(0, os.path.join(_ROOT, "scripts"))

    compiles = []

    class _Counter(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            # jax_log_compiles emits one WARNING-level
            # "Finished XLA compilation of <name> in <t> sec" per executable.
            if "Finished XLA compilation" in msg:
                compiles.append(msg)

    handler = _Counter(level=logging.WARNING)
    logging.getLogger("jax").addHandler(handler)

    import numpy as np

    import bench_zoo

    t0 = time.time()
    tr, spd, B = bench_zoo.build_trainer(model)
    t_trainer = time.time() - t0
    n_after_trainer = len(compiles)

    spd_eff = tr._effective_spd() if spd > 0 else 0
    t0 = time.time()
    if spd_eff > 0:
        _ = float(np.asarray(tr.train_chunk(0, spd_eff))[-1, 0])
    else:
        _ = float(tr.train_batch(0)[0])
    t_first = time.time() - t0
    n_after_first = len(compiles)

    # The post-densification program: for MMSSL the first chunk crossed a
    # rebuild (densify_period << chunk), so this dispatch compiles the
    # steady (use_init_static=False) executable; for the zoo it re-enters
    # the same program (near-zero).
    t0 = time.time()
    if spd_eff > 0:
        _ = float(np.asarray(tr.train_chunk(spd_eff, spd_eff))[-1, 0])
    else:
        _ = float(tr.train_batch(1)[0])
    t_steady = time.time() - t0
    n_after_steady = len(compiles)

    t0 = time.time()
    val = tr.evaluate("val")
    _ = float(val["recall"][0])
    t_eval = time.time() - t0

    print(json.dumps({
        "model": model,
        "mode": os.environ.get("MMSSL_COLDSTART_MODE", "warm-cache"),
        "t_trainer_s": round(t_trainer, 1),
        "t_first_chunk_s": round(t_first, 1),
        "t_steady_chunk_s": round(t_steady, 1),
        "t_eval_s": round(t_eval, 1),
        "t_total_s": round(t_trainer + t_first + t_steady + t_eval, 1),
        "n_compiles": len(compiles),
        "n_compiles_by_phase": [n_after_trainer, n_after_first - n_after_trainer,
                                n_after_steady - n_after_first,
                                len(compiles) - n_after_steady],
        "spd_eff": spd_eff,
    }), flush=True)


def main():
    if os.environ.get("MMSSL_COLDSTART_WORKER"):
        _worker()
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=[])
    ap.add_argument("--cold", action="store_true",
                    help="throwaway compile cache (true cold); default: repo "
                         ".jax_cache (process-cold, cache-warm)")
    args = ap.parse_args()
    models = args.models or ["mmssl", "micro", "lattice"]
    for model in models:
        env = dict(os.environ,
                   MMSSL_COLDSTART_WORKER="1",
                   MMSSL_COLDSTART_MODEL=model)
        if args.cold:
            env["MMSSL_COLDSTART_CACHE"] = tempfile.mkdtemp(prefix="coldcache_")
            env["MMSSL_COLDSTART_MODE"] = "cold"
        else:
            env["MMSSL_COLDSTART_CACHE"] = os.path.join(_ROOT, ".jax_cache")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, cwd=_ROOT, text=True, capture_output=True, timeout=3600,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not out:
            print(json.dumps({"model": model, "error":
                              (proc.stderr or proc.stdout)[-300:]}), flush=True)
        else:
            print(out[-1], flush=True)


if __name__ == "__main__":
    main()
