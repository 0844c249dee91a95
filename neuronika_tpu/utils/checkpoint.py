"""Orbax-backed training checkpoints (large-model tier).

`utils.serde` covers the reference's data-only serde contract (JSON /
npz, Var-tier state dicts — /root/reference/neuronika-variable src
`serde` feature). This module is the production-scale complement for the
functional tier: sharded-array-aware, asynchronous, retention-managed
checkpoints of whole train states (params + optimizer state + step),
built on orbax (the standard JAX checkpointing library).

* **async**: `save()` returns once the on-device arrays are snapshotted;
  serialization to disk overlaps the next training steps (the classic
  hide-the-checkpoint-cost pattern — call `wait()` before exiting).
* **sharded restore**: on a mesh, pass `like=` a pytree of
  ShapeDtypeStruct/arrays with `.sharding` set and each host restores
  only its shards (orbax handles the layout).
* **retention**: `keep` bounds how many checkpoints survive.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class Checkpointer:
    """Step-indexed train-state checkpoints.

    >>> ck = Checkpointer(dir, keep=3)
    >>> ck.save(step, {"params": params, "opt": opt_state})
    >>> state = ck.restore()                 # latest
    >>> state = ck.restore(step=1000)        # specific
    >>> ck.wait(); ck.close()
    """

    def __init__(self, directory: str, keep: int = 3,
                 async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=async_save,
            ),
        )

    # ---------------------------------------------------------------- save
    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Snapshot `state` (any pytree of arrays) at `step`. With async
        saving this returns quickly; disk I/O continues in background."""
        return self._mngr.save(
            int(step), args=self._ocp.args.StandardSave(state), force=force
        )

    # ------------------------------------------------------------- restore
    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        """Restore the checkpoint at `step` (default: latest). `like` — a
        matching pytree of arrays or ShapeDtypeStructs (with shardings
        for a distributed restore); without it, arrays come back with
        saved shapes/dtypes on the default device."""
        if step is None:
            step = self._mngr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self._dir}")
        if like is not None:
            args = self._ocp.args.StandardRestore(like)
        else:
            args = self._ocp.args.StandardRestore()
        return self._mngr.restore(int(step), args=args)

    # ----------------------------------------------------------- inventory
    def steps(self):
        return list(self._mngr.all_steps())

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    # ----------------------------------------------------------- lifecycle
    def wait(self) -> None:
        """Block until pending async saves hit disk."""
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self.close()


def save_train_state(directory: str, step: int, state: Any) -> None:
    """One-shot synchronous save (no manager lifecycle to hold)."""
    with Checkpointer(directory, async_save=False) as ck:
        ck.save(step, state)


def restore_train_state(directory: str, step: Optional[int] = None,
                        like: Any = None) -> Any:
    with Checkpointer(directory, async_save=False) as ck:
        return ck.restore(step, like)
