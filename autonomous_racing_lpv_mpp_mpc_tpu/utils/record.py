"""Structured log persistence + scenario-sweep checkpoint/resume.

Reference parity (SURVEY.md §5 "Checkpoint / resume"): the reference at most
np.save's closed-loop histories; the rebuild adds resumable sweep state so a
100k-scenario pod run can restart. Two tiers:

- ``save_log``/``load_log``: plain compressed npz of any pytree of arrays
  (closed-loop logs, reference tables) — dependency-free.
- ``SweepCheckpoint``: orbax-backed checkpoint of sweep state (per-scenario
  carries + plant states + step index + RNG), ``latest``-resume semantics.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_log(path: str, tree: Any, meta: Optional[Dict] = None) -> None:
    """Save any pytree of arrays as compressed npz (+ json meta)."""
    arrays, _ = _flatten_with_paths(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2)


def load_log(path: str) -> Dict[str, np.ndarray]:
    """Load a saved log as {path_key: array} (structure keys preserved)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


class SweepCheckpoint:
    """Orbax-backed checkpoint/resume for long scenario sweeps.

    State is any pytree: typically {"xs": (B, nx), "carries": MPCCarry
    batch, "step": int, "rng": key}. ``save`` keeps ``keep`` latest.
    """

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep),
        )

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template):
        """Restore the latest checkpoint into the shape of ``template``."""
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return None, None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return step, state
