"""Test harness config: run the real mesh/pjit code paths on 8 virtual CPU
devices (SURVEY.md §4 item 3). Must set env before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax (axon TPU plugin) before conftest
# runs, so env vars alone are too late; backends init lazily, so jax.config
# still wins as long as no jax computation has happened yet.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Heavy-module subprocess isolation (round 5, VERDICT r4 item 1).
#
# A full directory-level run compiles hundreds of XLA-CPU executables in one
# process; accumulated compilation has produced non-deterministic
# `Fatal Python error: Aborted` crashes (SIGABRT inside
# backend_compile_and_load or inside array fetches) that wander between
# modules as the suite grows — each module passes in isolation.  Per-module
# and per-function ``jax.clear_caches()`` (rounds 3-4) stopped being enough.
#
# Containment: the modules that compile big trainer/mesh/model programs are
# DESELECTED from in-process execution during directory-level runs and each
# is executed in its own subprocess instead (tests/test_zz_heavy_modules.py),
# so the main process only ever holds the light op-level executables.
#   * `pytest tests/test_trainer.py -q` (explicitly named) runs in-process,
#     unchanged — the per-file iteration workflow is unaffected.
#   * `pytest tests/ -q` runs light modules in-process + one proxy test per
#     heavy module; a heavy-module failure surfaces as that proxy's failure
#     with the inner pytest tail in the assertion message.
#   * `-m <expr>` runs (e.g. `-m fast`) skip the proxy logic entirely and
#     execute selected tests in-process; only `-m fast` is supported as a
#     subset (small compile count — no abort risk).
# ---------------------------------------------------------------------------

HEAVY_MODULES = (
    "test_checkpoint.py",
    "test_eval_sharded.py",
    "test_flops.py",
    "test_graft_entry.py",
    "test_models.py",
    "test_multiprocess.py",
    "test_quality_gate.py",
    "test_serve.py",
    "test_sharding.py",
    "test_trainer.py",
    "test_trainer_mesh.py",
    "test_training_parity.py",
)

# `-m fast` iteration subset (<5 min): golden values, op-level parity, plus
# one protocol run, one mesh equality, and one checkpoint roundtrip.
FAST_MODULES = (
    "test_data.py",
    "test_determinism.py",
    "test_evaluator.py",
    "test_faults.py",
    "test_knn.py",
    "test_losses.py",
    "test_memory.py",
    "test_metrics.py",
    "test_native_sampler.py",
)
FAST_TESTS = (
    "test_checkpoint.py::test_checkpoint_roundtrip",
    "test_sharding.py::test_sharded_step_matches_unsharded",
    "test_trainer.py::test_mmssl_trains",
)


def _explicit_targets(config):
    """Basenames of .py files named directly on the pytest command line."""
    names = set()
    for arg in config.invocation_params.args:
        a = str(arg)
        if a.startswith("-"):
            continue
        base = os.path.basename(a.split("::")[0])
        if base.endswith(".py"):
            names.add(base)
    return names


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        nodeid_tail = base + "::" + item.nodeid.split("::", 1)[-1]
        if base in FAST_MODULES or any(
            nodeid_tail.startswith(t) for t in FAST_TESTS
        ):
            item.add_marker(pytest.mark.fast)

    if os.environ.get("MMSSL_TPU_TESTS_IN_SUBPROCESS"):
        return  # inner (isolated) run: execute everything it collected
    explicit = _explicit_targets(config)
    markexpr = getattr(config.option, "markexpr", "")
    if markexpr:
        # Marker-filtered runs execute in-process.  Only `-m fast` is a
        # supported directory-level subset: any other expression would both
        # reintroduce the in-process SIGABRT risk (heavy modules run
        # un-isolated) and double-run every heavy module via the zz
        # proxies — refuse loudly instead of silently doing either.
        if markexpr.strip() != "fast" and not explicit:
            raise pytest.UsageError(
                f"-m {markexpr!r} is not supported for directory-level runs: "
                "only '-m fast' is (other expressions would run the heavy "
                "modules in-process AND again via their subprocess proxies). "
                "Name test files explicitly to use custom marker expressions."
            )
        return
    if getattr(config.option, "keyword", ""):
        # -k keyword runs select a handful of tests (no accumulated-compile
        # abort risk); skipping the proxy logic here keeps heavy-module
        # tests reachable by keyword — with it, `-k approx_topk` would
        # deselect the heavy-module match and silently run nothing.
        return

    kept, moved = [], []
    for item in items:
        base = os.path.basename(str(item.fspath))
        if base in HEAVY_MODULES and base not in explicit:
            moved.append(item)
        else:
            kept.append(item)
    if moved:
        items[:] = kept
        config.hook.pytest_deselected(items=moved)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Drop compiled executables between test modules.

    A full-suite run compiles hundreds of programs in one process; letting
    them accumulate has produced rare SIGABRT/SIGSEGV crashes inside XLA CPU
    ``backend_compile_and_load`` late in the run (the same tests pass in
    isolation).  Per-module cache clearing keeps the live-executable count
    bounded; recompiles within a module are unaffected."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def tiny_dataset(tmp_path_factory):
    """A ~50x30 synthetic dataset in the reference on-disk format."""
    from mmssl_tpu.config import DataConfig
    from mmssl_tpu.data import load_dataset, write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("data"))
    write_synthetic_dataset(root, "tiny", n_users=50, n_items=30, seed=7)
    cfg = DataConfig(data_path=root, dataset="tiny", batch_size=16)
    return load_dataset(cfg)
