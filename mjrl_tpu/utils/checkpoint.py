"""Checkpoint/resume via orbax: the full train state, atomically.

The reference checkpoints by pickling whole Python objects
(``best_policy.pickle``, ``policy_{i}.pickle``/``baseline_{i}.pickle`` every
``save_freq`` iterations; resume scans ``iterations/`` for the newest pair —
reference: mjrl/utils/train_agent.py) and silently loses optimizer state on
resume. Here the ENTIRE ``AgentState`` pytree (policy params + old params +
transforms + baseline + optimizer state + iteration + running_score) is one
orbax checkpoint: atomic, multi-host-aware, resume-exact (SURVEY.md §5.4).
A ``best`` checkpoint mirrors the reference's ``best_policy.pickle``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            os.path.join(self._dir, "iterations"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best = ocp.PyTreeCheckpointer()

    def save(self, step: int, state: Any) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))

    def save_best(self, state: Any) -> None:
        """The reference's ``best_policy.pickle`` equivalent."""
        path = os.path.join(self._dir, "best")
        self._best.save(path, jax.device_get(state), force=True)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, step: int, template: Any) -> Any:
        return self._mngr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_latest(self, template: Any) -> Optional[Any]:
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, template)

    def restore_best(self, template: Any) -> Any:
        return self._best.restore(os.path.join(self._dir, "best"), item=template)

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
