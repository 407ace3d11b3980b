"""Checkpointing with config sidecar, periodic save, and resume.

The reference only saves a final state_dict (train.py:88) plus, for
DGCNN, a config dict discovered by filename convention
(models/dgcnn/train_model.py:444-458, utils.py:26-44). This module
improves on that (as SURVEY.md §5 prescribes): numbered step
checkpoints of params + BN stats + optimizer state via
flax.serialization msgpack, a JSON config sidecar, `latest_checkpoint`
discovery, and full train-state resume.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import flax.serialization

_CKPT_RE = re.compile(r"checkpoint_(\d+)\.msgpack$")


def save_checkpoint(
    ckpt_dir: str,
    state,
    step: int | None = None,
    config: dict[str, Any] | None = None,
    keep: int = 5,
) -> str:
    """Serializes {params, batch_stats, opt_state, step} to
    `checkpoint_{step}.msgpack`; writes `config.json` alongside."""
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step) if step is None else int(step)
    payload = {
        "step": step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    path = os.path.join(ckpt_dir, f"checkpoint_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    os.replace(tmp, path)

    if config is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)

    # prune old checkpoints, newest `keep` survive
    ckpts = sorted(
        (int(m.group(1)), fn)
        for fn in os.listdir(ckpt_dir)
        if (m := _CKPT_RE.match(fn))
    )
    for _, fn in ckpts[:-keep] if keep > 0 else []:
        os.remove(os.path.join(ckpt_dir, fn))
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(
        (int(m.group(1)), fn)
        for fn in os.listdir(ckpt_dir)
        if (m := _CKPT_RE.match(fn))
    )
    return os.path.join(ckpt_dir, ckpts[-1][1]) if ckpts else None


def load_checkpoint(path: str, target: dict[str, Any]) -> dict[str, Any]:
    """Deserializes into the structure of `target` (same pytree defs)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())


def load_config(ckpt_dir: str) -> dict[str, Any] | None:
    p = os.path.join(ckpt_dir, "config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def restore_train_state(ckpt_dir_or_path: str, state):
    """Resumes a TrainState from a directory (latest) or explicit path."""
    path = (
        ckpt_dir_or_path
        if ckpt_dir_or_path.endswith(".msgpack")
        else latest_checkpoint(ckpt_dir_or_path)
    )
    if path is None:
        raise FileNotFoundError(f"No checkpoint found in {ckpt_dir_or_path}")
    import jax.numpy as jnp  # noqa: PLC0415

    target = {
        "step": int(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = load_checkpoint(path, target)
    import jax  # noqa: PLC0415

    # flax deserialization restores by tree structure only — validate
    # leaf shapes so a wrong-architecture checkpoint fails HERE with a
    # named path, not later inside a matmul
    mismatches = []

    def _check(path_parts, want, got):
        ws = getattr(want, "shape", None)
        gs = getattr(got, "shape", None)
        if ws is not None and gs is not None and tuple(ws) != tuple(gs):
            mismatches.append(f"{'/'.join(map(str, path_parts))}: {gs} vs model {ws}")

    jax.tree_util.tree_map_with_path(
        lambda p, w, g: _check([k.key if hasattr(k, "key") else k for k in p], w, g),
        state.params,
        restored["params"],
    )
    if mismatches:
        raise ValueError(
            f"Checkpoint {path} does not match the model architecture:\n  "
            + "\n  ".join(mismatches[:10])
        )

    return state.replace(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
