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
import jax.numpy as jnp
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


def _path_keys(path) -> tuple:
    """jax keypath -> orbax-style string keys ('mcl', 'best_pose', 'x')."""
    out = []
    for k in path:
        if hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            out.append(str(k))
    return tuple(out)


def _lookup(raw, keys):
    """Walk the raw nested-dict checkpoint by string keys; None if absent."""
    node = raw
    for k in keys:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return None if isinstance(node, dict) else node


# Fields added to MCLState/SLAMState after round 2, with their documented
# migration defaults (PARITY.md "checkpoint format"). Keys are leaf-path
# SUFFIXES matched against the template's flattened paths; values map the
# missing leaf to (source path in the OLD checkpoint, fallback literal).
# Rationale: `est_pose`/`mode_pose` start from the saved best particle —
# exactly what pre-round-3/4 engines reported as their estimate; the
# adaptive EMAs restart from their NaN "no update seen" sentinel (they
# warm-start from the first observed likelihood, models/mcl.py); `updates`
# restarts from the saved frame counter `step` (exact when update_every=1,
# an upper bound otherwise — the every-k throttles at most fire one early).
_MIGRATIONS = {
    ("est_pose",): (("mcl", "best_pose"), None),
    ("mode_pose",): (("mcl", "best_pose"), None),
    ("log_w_slow",): (None, float("nan")),
    ("log_w_fast",): (None, float("nan")),
    ("updates",): (("mcl", "step"), 0),
}


def _migrate(raw: dict, template: Any):
    """Fill fields absent from an old-format checkpoint with documented
    defaults; returns (state_tree_unkeyed, filled_paths). Raises ValueError
    when a SAVED leaf mismatches the template (a genuine incompatibility,
    not a format addition)."""
    import jax.tree_util as jtu

    tpl_u = _unkey(template)
    leaves_p, treedef = jtu.tree_flatten_with_path(tpl_u)
    out, filled = [], []
    for path, tleaf in leaves_p:
        keys = _path_keys(path)
        saved = _lookup(raw, keys)
        if saved is not None:
            ts = tuple(getattr(tleaf, "shape", ()))
            if tuple(np.shape(saved)) != ts:
                raise ValueError(
                    f"checkpoint field {'/'.join(keys)} has shape "
                    f"{tuple(np.shape(saved))} but the template expects "
                    f"{ts} — this is a real config mismatch (particle "
                    "count / map size), not a format change; migration "
                    "cannot fix it"
                )
            out.append(jnp.asarray(saved, getattr(tleaf, "dtype", None)))
            continue
        # Missing: a field added after this checkpoint was written.
        fill = tleaf
        for suffix, (src, literal) in _MIGRATIONS.items():
            if keys[-len(suffix):] == suffix or (
                len(keys) >= len(suffix) + 1
                and keys[-len(suffix) - 1 : -1] == suffix
            ):
                # Match 'est_pose' itself (scalar fields) or its children
                # ('est_pose'/'x' for Pose subtrees).
                src_leaf = None
                if src is not None:
                    child = keys[-1:] if keys[-len(suffix) - 1 : -1] == suffix else ()
                    src_leaf = _lookup(raw, src + child)
                if src_leaf is not None:
                    fill = jnp.asarray(
                        src_leaf, getattr(tleaf, "dtype", None)
                    )
                elif literal is not None:
                    fill = jnp.full(
                        getattr(tleaf, "shape", ()),
                        literal,
                        getattr(tleaf, "dtype", jnp.float32),
                    )
                break
        name = "/".join(keys)
        if keys[-1] == "edt":
            # A DERIVED cache: the template's value belongs to the
            # template's grid, not the restored one — consumers must
            # re-derive (slam.rebuild_edt) after a migrated restore.
            name += " (derived cache — re-derive from the restored grid," \
                    " e.g. slam.rebuild_edt)"
        filled.append(name)
        out.append(fill)
    return jtu.tree_unflatten(treedef, out), filled


def save(path: str, state: Any) -> None:
    """Write a pytree state to `path` (a directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _unkey(state), force=True)


def restore(path: str, template: Any) -> Any:
    """Read a pytree state saved by `save`; `template` supplies the
    structure/dtypes (e.g. a freshly-initialized state).

    Old-format checkpoints (saved before fields like `est_pose`,
    `mode_pose`, `updates`, or the adaptive EMAs existed) are MIGRATED:
    missing fields fill with documented defaults (see `_MIGRATIONS`) and a
    warning lists them, instead of refusing to restore."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        try:
            raw = ckptr.restore(path, _unkey(template))
        except (ValueError, KeyError):
            raw = _migrate_restore(ckptr.restore(path), template, path)
    return _rekey(raw, template)


def _migrate_restore(raw: dict, template: Any, where: str) -> Any:
    migrated, filled = _migrate(raw, template)
    if filled:
        from slam_tpu.utils.logging import get_logger

        get_logger(__name__).warning(
            "checkpoint at %s predates the current state format; filled "
            "%d missing field(s) with migration defaults: %s",
            where,
            len(filled),
            ", ".join(filled),
        )
    return migrated


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
            # PARITY.md "checkpoint format"). Migrate: restore the raw tree
            # and fill the missing fields with documented defaults; a
            # GENUINE mismatch (shape/config drift) still raises, from
            # _migrate, with the actionable cause.
            try:
                raw_tree = self._mgr.restore(
                    step, args=ocp.args.StandardRestore()
                )
            except Exception:
                raise ValueError(
                    f"checkpoint at step {step} does not match the current "
                    "state structure and could not be read raw for "
                    "migration. Delete the checkpoint directory to start "
                    f"fresh. Underlying error: {e}"
                ) from e
            raw = _migrate_restore(
                raw_tree, template, f"step {step} in {self._mgr.directory}"
            )
        return _rekey(raw, template)

    def close(self):
        self._mgr.close()
