"""Subprocess proxies for the heavy compile-bound test modules.

Directory-level runs deselect the modules in ``conftest.HEAVY_MODULES`` from
in-process execution (see the containment note in tests/conftest.py) and run
each one here in its own subprocess instead: the XLA-CPU accumulated-
executable SIGABRT cannot cross a process boundary, and every heavy module is
known-green in isolation.  The proxy fails with the inner pytest tail when
the module fails, so `python -m pytest tests/ -q` stays a single honest
command.  Named `zz` so the light in-process modules run (and fail) first.
"""

import os
import subprocess
import sys

import pytest

from conftest import HEAVY_MODULES

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)

# Generous per-module budgets (seconds) on the 2-core container; the whole
# suite is ~30 min, the largest single module (test_multiprocess, which
# itself spawns 2-process jax.distributed clusters) ~7 min in isolation.
_TIMEOUTS = {
    "test_multiprocess.py": 2400,
    "test_training_parity.py": 2400,
    "test_trainer.py": 2400,
}
_DEFAULT_TIMEOUT = 1800


@pytest.mark.parametrize("module", HEAVY_MODULES)
def test_heavy_module_in_subprocess(module):
    env = dict(os.environ, MMSSL_TPU_TESTS_IN_SUBPROCESS="1")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            os.path.join(_TESTS_DIR, module),
            "-q",
            "--no-header",
            "-p",
            "no:cacheprovider",
        ],
        cwd=_REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=_TIMEOUTS.get(module, _DEFAULT_TIMEOUT),
    )
    if proc.returncode != 0:
        tail = "\n".join((proc.stdout + "\n" + proc.stderr).splitlines()[-60:])
        pytest.fail(
            f"{module} failed in its subprocess (exit {proc.returncode}).\n"
            f"Re-run in-process with: python -m pytest tests/{module} -q\n"
            f"--- inner output tail ---\n{tail}"
        )
