"""Demonstration import: mjrl path dicts -> TrajectoryBatch.

The reference's DAPG pipeline consumes demos as pickled lists of path dicts
(``{observations (T,do), actions (T,da), rewards (T,), terminated}`` —
reference: mjrl/algos/dapg.py ctor, hand_dapg demo pickles). This module
packs such variable-length paths into the fixed-shape masked
:class:`TrajectoryBatch` so existing mjrl demo files drive BC/DAPG here
unchanged.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from mjrl_tpu.types import TrajectoryBatch, zeros_trajectory_batch


def paths_to_batch(
    paths: Sequence[Dict[str, Any]],
    horizon: Optional[int] = None,
) -> TrajectoryBatch:
    """Pack variable-length path dicts into one masked batch.

    Each path needs ``observations (T, do)`` and ``actions (T, da)``;
    ``rewards`` and ``terminated`` are optional (demos often omit rewards).
    """
    if not paths:
        raise ValueError("no paths given")
    T = horizon or max(len(np.asarray(p["observations"])) for p in paths)
    do = np.asarray(paths[0]["observations"]).shape[-1]
    da = np.asarray(paths[0]["actions"]).shape[-1]
    N = len(paths)
    batch = zeros_trajectory_batch(N, T, do, da)
    obs = np.zeros((N, T, do), np.float32)
    act = np.zeros((N, T, da), np.float32)
    rew = np.zeros((N, T), np.float32)
    valid = np.zeros((N, T), bool)
    done = np.zeros((N, T), bool)
    term = np.zeros((N, T), bool)
    for i, p in enumerate(paths):
        o = np.asarray(p["observations"], np.float32)[:T]
        a = np.asarray(p["actions"], np.float32)[:T]
        L = len(o)
        obs[i, :L] = o
        act[i, :L] = a
        if "rewards" in p:
            rew[i, :L] = np.asarray(p["rewards"], np.float32)[:T]
        valid[i, :L] = True
        done[i, L - 1] = True
        term[i, L - 1] = bool(p.get("terminated", False))
    return batch.replace(
        observations=jnp.asarray(obs),
        actions=jnp.asarray(act),
        rewards=jnp.asarray(rew),
        valid=jnp.asarray(valid),
        done=jnp.asarray(done),
        terminated=jnp.asarray(term),
    )


def load_demo_pickle(path: str, horizon: Optional[int] = None) -> TrajectoryBatch:
    """Load an mjrl-format demo pickle (list of path dicts)."""
    with open(path, "rb") as f:
        paths = pickle.load(f)
    return paths_to_batch(paths, horizon)


def batch_to_paths(batch: TrajectoryBatch) -> List[Dict[str, np.ndarray]]:
    """Inverse: masked batch -> list of variable-length path dicts (for
    exporting demos back to reference tooling)."""
    out = []
    valid = np.asarray(batch.valid)
    for i in range(batch.num_envs):
        L = int(valid[i].sum())
        out.append(
            dict(
                observations=np.asarray(batch.observations[i, :L]),
                actions=np.asarray(batch.actions[i, :L]),
                rewards=np.asarray(batch.rewards[i, :L]),
                terminated=bool(np.asarray(batch.terminated[i, :L]).any()),
            )
        )
    return out
