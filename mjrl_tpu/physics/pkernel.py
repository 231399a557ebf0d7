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


def _kernel_body_ext(
    model, n_frames, unroll, has_tendon, has_delta, *refs
):
    """Kernel body with optional extra inputs.

    Ref order: q, qd, ctrl, [Jq, Jv, tendon_params], [link_delta],
    q_out, qd_out. Tendon matrices arrive as kernel INPUTS (replicated
    across grid cells — pallas_call cannot capture array constvars);
    link_delta is a lane-tiled per-env input like q/qd/ctrl.
    """
    refs = list(refs)
    q_ref, qd_ref, ctrl_ref = refs[:3]
    i = 3
    tendon = None
    if has_tendon:
        tendon = (refs[i][...], refs[i + 1][...], refs[i + 2][...])
        i += 3
    delta = None
    if has_delta:
        delta = refs[i][...]
        i += 1
    qo_ref, qdo_ref = refs[i], refs[i + 1]
    q2, qd2 = soa.multistep(
        model, q_ref[...], qd_ref[...], ctrl_ref[...], n_frames,
        unroll=unroll, tendon=tendon, link_delta=delta,
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
    link_delta: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-last multi-frame step: q (nq, B), qd (nv, B), ctrl (nu, B).

    ``link_delta`` (``(3*nlink, B)``, optional): per-env scene offsets.
    """
    nq, B = q.shape
    nv = qd.shape[0]
    nu = ctrl.shape[0]
    ncand = soa.num_contact_candidates(model)
    if ncand > 64:
        # candidate-heavy bodies (Adroit: ~680 contact points) blow the
        # 16M scoped-VMEM stack at 256 lanes; halve the block
        blk = min(blk, 128)
    # NOTE on newton vmem (round-4 pen DAPG compile failure, 52 MB scoped
    # vmem at the 16 MB limit): shrinking blk below 128 does NOT reduce
    # the stack — every (1, B) row buffer occupies a full (8, 128) f32
    # tile regardless of B < 128. The levers that work are (a) never
    # unrolling substeps for candidate-heavy models (below) and (b) the
    # packed row assembly in soa_newton keeping the live row count down.
    blk = min(blk, max(128, B))
    Bp = -(-B // blk) * blk
    if Bp != B:
        # pad by edge-replication: padded lanes run valid physics and are
        # dropped on return (no cross-lane ops exist in the kernel)
        pad = ((0, 0), (0, Bp - B))
        q = jnp.pad(q, pad, mode="edge")
        qd = jnp.pad(qd, pad, mode="edge")
        ctrl = jnp.pad(ctrl, pad, mode="edge")
        if link_delta is not None:
            link_delta = jnp.pad(link_delta, pad, mode="edge")
    total_substeps = n_frames * model.n_substeps
    # Candidate-heavy models must NOT unroll: each unrolled substep's
    # newton/contact row set extends the kernel's scoped-vmem high-water
    # mark (dispatch.py's non-Pallas path has the same guard).
    unroll = total_substeps <= _UNROLL_MAX and ncand <= 64
    spec = lambda rows: pl.BlockSpec(
        (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    # whole-array (grid-replicated) spec for the small tendon constants
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    has_tendon = model.tendon_Jq is not None
    has_delta = link_delta is not None
    in_specs = [spec(nq), spec(nv), spec(nu)]
    operands = [q, qd, ctrl]
    if has_tendon:
        jq, jv, tp = soa.tendon_params(model)
        in_specs += [rep(jq.shape), rep(jv.shape), rep(tp.shape)]
        operands += [jnp.asarray(jq), jnp.asarray(jv), jnp.asarray(tp)]
    if has_delta:
        in_specs.append(spec(link_delta.shape[0]))
        operands.append(link_delta)
    if has_tendon or has_delta:
        body = functools.partial(
            _kernel_body_ext, model, n_frames, unroll, has_tendon, has_delta
        )
    else:
        body = functools.partial(_kernel_body, model, n_frames, unroll)
    q2, qd2 = pl.pallas_call(
        body,
        grid=(Bp // blk,),
        in_specs=in_specs,
        out_specs=[spec(nq), spec(nv)],
        out_shape=[
            jax.ShapeDtypeStruct((nq, Bp), jnp.float32),
            jax.ShapeDtypeStruct((nv, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    if Bp != B:
        q2, qd2 = q2[:, :B], qd2[:, :B]
    return q2, qd2
