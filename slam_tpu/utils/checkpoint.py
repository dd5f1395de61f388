"""Checkpoint / resume for filter and SLAM state.

The reference has NO checkpointing (SURVEY.md section 5: all state in
memory; planners resumable only via the incremental pathfind API). For
production SLAM the filter state (particles, log-odds grid, RNG key, step
counter) must survive restarts; this module wraps orbax with transparent
handling of typed PRNG keys (orbax serializes raw arrays, so keys round-trip
through `jax.random.key_data` / `wrap_key_data`).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _is_key(leaf) -> bool:
    return hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
        leaf.dtype, jax.dtypes.prng_key
    )


def _unkey(tree):
    return jax.tree.map(
        lambda l: jax.random.key_data(l) if _is_key(l) else l, tree
    )


def _rekey(tree, template):
    return jax.tree.map(
        lambda l, t: jax.random.wrap_key_data(l) if _is_key(t) else l,
        tree,
        template,
    )


def save(path: str, state: Any) -> None:
    """Write a pytree state to `path` (a directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _unkey(state), force=True)


def restore(path: str, template: Any) -> Any:
    """Read a pytree state saved by `save`; `template` supplies the
    structure/dtypes (e.g. a freshly-initialized state)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(path, _unkey(template))
    return _rekey(raw, template)


class CheckpointManager:
    """Rolling step-indexed checkpoints (keep the latest `max_to_keep`)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_unkey(state)))

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            # Distinguish "nothing saved yet" from a format mismatch — the
            # rewrap below advises deleting the directory, which is the
            # wrong advice for an empty manager.
            raise FileNotFoundError(
                f"no checkpoint found under {self._mgr.directory} — nothing "
                "has been saved yet (latest_step() is None)"
            )
        try:
            raw = self._mgr.restore(
                step, args=ocp.args.StandardRestore(_unkey(template))
            )
        except (ValueError, KeyError) as e:
            # Orbax raises an opaque structure-mismatch error when the saved
            # pytree predates a state-format change (e.g. SLAMState.est_pose
            # and the NaN-initialized MCL EMAs added after round 2 — see
            # PARITY.md "checkpoint format"). Surface the actionable cause.
            raise ValueError(
                f"checkpoint at step {step} does not match the current state "
                "structure — it likely predates a SLAMState/MCLState format "
                "change (est_pose / adaptive EMAs). Delete the checkpoint "
                "directory to start fresh, or restore with the matching "
                f"older code. Underlying error: {e}"
            ) from e
        return _rekey(raw, template)

    def close(self):
        self._mgr.close()
