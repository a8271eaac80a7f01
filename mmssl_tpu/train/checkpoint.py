"""Checkpoint / resume.

Net-new subsystem (SURVEY.md §5.4: the reference's --isload/--loadModelPath
flags have no call sites; no model state is ever saved).  Saves the full
training state — model + discriminator params, both optimizer states, the
densified-graph COO state and buffers, PRNG key, and step/epoch counters —
via orbax, so a run resumes bit-exactly where it stopped.

Typed PRNG keys are converted to raw key data for serialization and
re-wrapped on restore.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _externalize(tree: Any) -> Any:
    """Replace typed PRNG key arrays with raw uint32 key data."""
    def fix(leaf):
        if isinstance(leaf, jax.Array) and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            return jax.random.key_data(leaf)
        return leaf

    return jax.tree.map(fix, tree)


def _internalize(tree: Any, template: Any) -> Any:
    """Re-wrap key data into typed keys where the template has keys."""
    def fix(restored, tmpl):
        if isinstance(tmpl, jax.Array) and jnp.issubdtype(tmpl.dtype, jax.dtypes.prng_key):
            # Re-wrap with the template's PRNG impl (train.prng_impl may be
            # rbg, whose key data is [4]xu32 vs threefry's [2]).
            data = jnp.asarray(restored, dtype=jnp.uint32)
            impl = jax.random.key_impl(tmpl)
            expect = jax.random.key_data(tmpl).shape
            if tuple(data.shape) != tuple(expect):
                raise ValueError(
                    f"checkpoint PRNG key data has shape {tuple(data.shape)} but this "
                    f"trainer's train.prng_impl ({impl}) expects {tuple(expect)} — the "
                    "checkpoint was written under a different train.prng_impl; restore "
                    "with the config it was saved under (or re-seed a fresh run)."
                )
            return jax.random.wrap_key_data(data, impl=impl)
        return restored

    return jax.tree.map(fix, tree, template)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, extra: Optional[Dict[str, Any]] = None) -> None:
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_externalize(state)),
                extra=ocp.args.JsonSave(extra or {}),
            ),
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def read_extra(self, step: Optional[int] = None) -> Tuple[int, Dict[str, Any]]:
        """Read only the JSON ``extra`` metadata of a checkpoint (no tensor
        restore) — used to decide how to interpret the saved state (e.g. the
        geometry-portable format marker) before building the restore
        template."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
        )
        return step, restored["extra"] or {}

    def restore(self, state_template: Any, step: Optional[int] = None) -> Tuple[Any, Dict[str, Any]]:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(_externalize(state_template)),
                extra=ocp.args.JsonRestore(),
            ),
        )
        state = _internalize(restored["state"], state_template)
        return state, restored["extra"] or {}

    def close(self) -> None:
        self._mgr.close()
