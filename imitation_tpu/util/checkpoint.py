"""Sharded pytree checkpointing with exact loop-state resume.

The reference checkpoints by pickling whole Python objects with torch
(reference SURVEY §5: ``th.save``/``th.load`` of trainer objects,
dagger.py:518-549, train_adversarial.py:25-35). The TPU-native story is
orbax: any training state — RLState, DiscState, DQNState, SACState, BC
state — is a pytree of arrays, saved as a (potentially sharded) orbax
checkpoint and restored onto the current mesh layout, giving exact resume
of the jitted loop including optimizer moments, env state and PRNG keys.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _to_savable(tree: Any) -> Any:
    """PRNG keys -> raw uint32 key data (orbax can't serialize typed keys)."""

    def conv(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return {"__prng_key_data__": jax.random.key_data(x)}
        return x

    return jax.tree.map(conv, tree)


def _from_savable(tree: Any) -> Any:
    def conv(x):
        if isinstance(x, dict) and "__prng_key_data__" in x:
            return jax.random.wrap_key_data(x["__prng_key_data__"])
        return x

    return jax.tree.map(conv, tree, is_leaf=lambda x: isinstance(x, dict) and "__prng_key_data__" in x)


def save_state(path: str, state: Any) -> None:
    """Saves a training-state pytree to ``path`` (orbax checkpoint dir)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_savable(jax.device_get(state)), force=True)
    ckptr.wait_until_finished()


def restore_state(path: str, template: Any) -> Any:
    """Restores a pytree saved by ``save_state``; ``template`` provides the
    structure/shardings (e.g. a freshly built init_state())."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, _to_savable(jax.device_get(template)))
    # Rebuild on the template's structure so flax struct classes survive.
    flat_restored = jax.tree.leaves(_from_savable(restored))
    treedef = jax.tree.structure(
        template,
    )
    return jax.tree.unflatten(treedef, flat_restored)


class CheckpointManager:
    """Periodic checkpointing with retention (thin orbax wrapper)."""

    def __init__(self, directory: str, max_to_keep: int = 3, save_every: int = 1):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        self.save_every = save_every
        os.makedirs(self.directory, exist_ok=True)

    def _step_path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:012d}")

    def maybe_save(self, step: int, state: Any) -> bool:
        if step % self.save_every != 0:
            return False
        save_state(self._step_path(step), state)
        self._cleanup()
        return True

    def _cleanup(self) -> None:
        import shutil

        steps = self.all_steps()
        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(self._step_path(s), ignore_errors=True)

    def all_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                steps.append(int(name[len("step_"):]))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore_latest(self, template: Any) -> Any:
        step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return restore_state(self._step_path(step), template)
