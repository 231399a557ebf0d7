"""Pallas TPU mega-kernel: a full control step of physics per launch.

Wraps the batch-last SoA substep (physics/soa.py) in one ``pl.pallas_call``:
the grid tiles the env batch into lane blocks, and each grid cell advances
its block of envs through ``n_frames x model.n_substeps`` substeps entirely
in VMEM — one kernel launch per control step instead of ~450 XLA fusions
per substep, and every vector op runs on fully-populated 128-lane vregs.

The ant control step (frame_skip 5 x 4 substeps = 20 substeps) is a single
launch. Measured on TPU v5e this is the difference between ~60k env-steps/s
(per-env vmap engine, flat in batch size) and multi-million env-steps/s.

The kernel body is plain jnp code (static slices / concats / elementwise /
cross-sublane reductions only), so the SAME function is also jit-compiled
directly for the non-Pallas fallback and runs under ``interpret=True`` in
CPU tests.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mjrl_tpu.physics import soa
from mjrl_tpu.physics.model import Model

# Lanes per grid cell. 256 keeps each (k, B) row at 2 vregs — enough to
# amortize per-instruction overhead without blowing up VMEM live range.
_BLK = 256
# Substep counts <= this unroll fully inside the kernel; above it a
# fori_loop bounds Mosaic instruction count / compile time.
_UNROLL_MAX = 8


def _kernel_body(model, n_frames, unroll, q_ref, qd_ref, ctrl_ref, qo_ref, qdo_ref):
    q2, qd2 = soa.multistep(
        model, q_ref[...], qd_ref[...], ctrl_ref[...], n_frames, unroll=unroll
    )
    qo_ref[...] = q2
    qdo_ref[...] = qd2


def multistep_pallas(
    model: Model,
    q: jax.Array,
    qd: jax.Array,
    ctrl: jax.Array,
    n_frames: int = 1,
    blk: int = _BLK,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-last multi-frame step: q (nq, B), qd (nv, B), ctrl (nu, B)."""
    nq, B = q.shape
    nv = qd.shape[0]
    nu = ctrl.shape[0]
    blk = min(blk, max(128, B))
    Bp = -(-B // blk) * blk
    if Bp != B:
        # pad by edge-replication: padded lanes run valid physics and are
        # dropped on return (no cross-lane ops exist in the kernel)
        pad = ((0, 0), (0, Bp - B))
        q = jnp.pad(q, pad, mode="edge")
        qd = jnp.pad(qd, pad, mode="edge")
        ctrl = jnp.pad(ctrl, pad, mode="edge")
    total_substeps = n_frames * model.n_substeps
    unroll = total_substeps <= _UNROLL_MAX
    body = functools.partial(_kernel_body, model, n_frames, unroll)
    spec = lambda rows: pl.BlockSpec(
        (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    q2, qd2 = pl.pallas_call(
        body,
        grid=(Bp // blk,),
        in_specs=[spec(nq), spec(nv), spec(nu)],
        out_specs=[spec(nq), spec(nv)],
        out_shape=[
            jax.ShapeDtypeStruct((nq, Bp), jnp.float32),
            jax.ShapeDtypeStruct((nv, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(q, qd, ctrl)
    if Bp != B:
        q2, qd2 = q2[:, :B], qd2[:, :B]
    return q2, qd2
