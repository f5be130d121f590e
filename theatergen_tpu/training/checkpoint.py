"""Training-state checkpointing via orbax.

The reference is inference-only (its persistent state is the image tree +
character DB, SURVEY.md §5); the TPU framework's trainer
(:mod:`.diffusion`) adds model/optimizer state that must survive
preemption on TPU pods.  Orbax handles sharded arrays transparently, so
the same checkpoint works across mesh shapes.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any, *, force: bool = True) -> None:
    """Save a pytree (e.g. ``TrainState``) to ``path`` (a directory)."""
    ckpt = _checkpointer()
    ckpt.save(os.path.abspath(path), state, force=force)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` (matching structure, e.g. an abstract
    state from ``jax.eval_shape``) guides dtypes/shardings when given."""
    ckpt = _checkpointer()
    if target is not None:
        return ckpt.restore(os.path.abspath(path), item=target)
    return ckpt.restore(os.path.abspath(path))


def latest_step_dir(root: str) -> Optional[str]:
    """Convention: ``{root}/step_{N}`` directories; returns the newest."""
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])
