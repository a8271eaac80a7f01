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
