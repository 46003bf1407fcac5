"""Checkpointing: one logical checkpoint per run.

The reference saves a per-rank torch dict every epoch and has every rank
load rank-0's file (``models/trainer.py:200-224``).  With JAX's single-
controller model there is one logical checkpoint; restore re-shards
automatically when device count changes.  Format: flax msgpack for the
array tree + a JSON sidecar for scalar metadata (step, epochs_run, run_id,
best_metric_value) so runs are inspectable without deserialising weights.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(
    path: str,
    array_tree: Dict[str, Any],
    metadata: Dict[str, Any],
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree.map(lambda x: jax.device_get(x), array_tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_tree))
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint
    # the meta sidecar gets the same tmp+replace treatment: a crash between
    # the two replaces can pair new weights with the PREVIOUS meta (benign:
    # resume re-runs at most one epoch), but never with a torn JSON that
    # would make load_checkpoint raise and block auto-resume entirely
    meta_tmp = path + ".meta.json.tmp"
    with open(meta_tmp, "w") as f:
        json.dump(metadata, f, indent=2)
    os.replace(meta_tmp, path + ".meta.json")


def load_checkpoint(
    path: str, target: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """:param target: a pytree with the right structure (e.g. fresh init)."""
    with open(path, "rb") as f:
        raw = f.read()
    try:
        tree = serialization.from_bytes(target, raw)
    except Exception as e:
        # name the file: auto-resume (latest_checkpoint) retries every
        # startup, so an unnamed msgpack error would block training with no
        # hint which file is bad or how to recover.  Distinguish the two
        # failure classes by re-parsing without a target: bytes that
        # msgpack-decode fine are a healthy checkpoint whose STRUCTURE no
        # longer matches the code/config — never tell the user to delete it.
        try:
            serialization.msgpack_restore(raw)
            structure_mismatch = True
        except Exception:
            structure_mismatch = False
        if structure_mismatch:
            raise ValueError(
                f"{path}: checkpoint does not match the current model/"
                f"optimizer structure ({type(e).__name__}: {e}); it was "
                "likely saved under a different config — the file itself is "
                "intact, so fix the config (or load with the matching one) "
                "rather than deleting it") from e
        raise ValueError(
            f"{path}: corrupt or unreadable checkpoint ({type(e).__name__}: "
            f"{e}); move it aside to start fresh") from e
    meta_path = path + ".meta.json"
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            try:
                metadata = json.load(f)
            except json.JSONDecodeError as e:
                raise ValueError(
                    f"{meta_path}: corrupt checkpoint metadata ({e}); "
                    "move it aside to start fresh") from e
    return tree, metadata


def latest_checkpoint(log_dir: str, seed: int) -> Optional[str]:
    """Auto-resume discovery (reference checks chkpt existence on startup,
    trainer.py:91-93)."""
    path = checkpoint_path(log_dir, seed)
    return path if os.path.exists(path) else None


def checkpoint_path(log_dir: str, seed: int) -> str:
    return os.path.join(log_dir, "chkpts", f"chkpt_seed{seed}.msgpack")
