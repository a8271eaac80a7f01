"""Smoke tests for the driver entry points (__graft_entry__.py).

The round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on N virtual CPU devices — if either regresses, the
round's multi-chip signal is lost, so keep them under test on the same
8-virtual-device CPU backend the suite already runs on."""

import gc
import importlib.util
import os

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _clear_caches_per_test():
    """Per-FUNCTION executable clearing (same mitigation as test_trainer /
    test_flops): the dryrun compiles the largest per-test program set in
    the suite, and XLA-CPU's backend_compile_and_load aborts when it runs
    with too many live executables from preceding modules in the same
    process."""
    jax.clear_caches()
    gc.collect()
    yield
    jax.clear_caches()
    gc.collect()


def _load_graft_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_forward_jits_and_is_finite():
    ge = _load_graft_entry()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 8
    assert bool(jnp.isfinite(out).all())


def test_dryrun_multichip_8():
    ge = _load_graft_entry()
    ge.dryrun_multichip(8)  # asserts finite losses internally
