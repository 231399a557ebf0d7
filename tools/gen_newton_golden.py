#!/usr/bin/env python
"""Regenerate the golden engine-side Newton-substep oracle table.

tests/test_soa_newton.py's ant case needs the per-env engine csolve output
as reference, but the vmapped engine Newton solve is a ~hour XLA:CPU
compile — far too slow for the default suite. This script runs that engine
side ONCE (any backend; the TPU compiles it in under a minute) and stores
inputs + outputs in ``tests/golden/<env>_newton_substep.npz``. The default
suite then only compiles the cheap SoA side and compares against the
stored table; the live engine-vs-SoA comparison remains available under
``MJRL_TPU_SLOW_TESTS=1``.

Regenerate whenever the engine csolve path or the env models change:

    python tools/gen_newton_golden.py ant
"""

from __future__ import annotations

import copy
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "ant"
    B = 4
    from mjrl_tpu import envs
    from mjrl_tpu.physics import soa
    from mjrl_tpu.physics.engine import step as engine_step

    env = envs.make(name, horizon=32, constraint_solver="newton")
    model = env.model
    assert soa.soa_supported(model)
    if name == "ant":
        model.solver_iters = 3  # same reduction the test applies on BOTH sides

    # Warm states through the penalty env (mirrors the test fixture).
    env_pen = envs.make(name, horizon=32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    st, _ = jax.vmap(env_pen.reset)(keys)
    k = jax.random.PRNGKey(0)
    for _ in range(3):
        k, ka = jax.random.split(k)
        a = jax.random.uniform(ka, (B, env.spec.action_dim), minval=-1.0, maxval=1.0)
        st, *_ = jax.vmap(env_pen.step)(st, a)
    ctrl = jax.random.uniform(
        jax.random.PRNGKey(1), (B, env.spec.action_dim), minval=-1.0, maxval=1.0
    )
    dt = model.dt / model.n_substeps
    m1 = copy.copy(model)
    m1.n_substeps = 1
    m1.dt = dt
    ref = jax.jit(jax.vmap(lambda s, c: engine_step(m1, s, c)))(st, ctrl)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", f"{name}_newton_substep.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(
        out,
        q=np.asarray(st.q, np.float32),
        qd=np.asarray(st.qd, np.float32),
        ctrl=np.asarray(ctrl, np.float32),
        dt=np.float32(dt),
        solver_iters=np.int32(model.solver_iters),
        ref_q=np.asarray(ref.q, np.float32),
        ref_qd=np.asarray(ref.qd, np.float32),
        backend=str(jax.default_backend()),
    )
    print(f"wrote {out} (engine backend: {jax.default_backend()})")


if __name__ == "__main__":
    main()
