#!/usr/bin/env python
"""Compile-and-time probe for the SoA/Pallas newton training path.

Usage: python tools/probe_soa_newton.py [env_name] [B]

Compiles ``vmap(env.step)`` for the given newton-solver env at batch B on
the current backend, runs a few steps, and prints steps/s — the go/no-go
check for riding the fast path in training (the adroit newton programs
historically overflowed the Pallas scoped-vmem budget / the tunneled
remote-compile helper; physics/soa_newton.py's rebuild-in-loop mode is
the fix under test). Run as a queue ``%py`` step so it shares the chip
claim.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    set_np = False
    prev_np = os.environ.get("MJRL_TPU_NO_PALLAS")
    if "--no-pallas" in sys.argv:
        # Route the TPU SoA path through plain XLA jit instead of the
        # Pallas mega-kernel (dispatch.py escape hatch): the adroit
        # newton MOSAIC compile is what overflows the remote helper —
        # XLA:TPU may survive the same batch-last program. The env var
        # is restored on exit so an in-queue %py invocation does not
        # leak it into later jobs.
        os.environ["MJRL_TPU_NO_PALLAS"] = "1"
        set_np = True
        sys.argv.remove("--no-pallas")
    try:
        _probe()
    finally:
        if set_np:
            if prev_np is None:
                os.environ.pop("MJRL_TPU_NO_PALLAS", None)
            else:
                os.environ["MJRL_TPU_NO_PALLAS"] = prev_np


def _probe() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "adroit_pen"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from mjrl_tpu import envs

    env = envs.make(name, constraint_solver="newton")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    st, obs = jax.vmap(env.reset)(keys)
    act = jax.random.uniform(
        jax.random.PRNGKey(1), (B, env.spec.action_dim), minval=-1, maxval=1
    )
    step = jax.jit(jax.vmap(env.step))
    t0 = time.time()
    try:
        compiled = step.lower(st, act).compile()
    except Exception as e:  # noqa: BLE001 - report and exit nonzero
        print(
            f"PROBE FAIL {name} B={B}: compile failed after "
            f"{time.time() - t0:.1f}s: {type(e).__name__}: {str(e)[:600]}"
        )
        sys.exit(2)
    print(f"PROBE {name} B={B}: compiled in {time.time() - t0:.1f}s")
    st2, _, r, _, _ = compiled(st, act)
    float(jnp.sum(r))
    n = 20
    t0 = time.time()
    for _ in range(n):
        st2, _, r, _, _ = compiled(st2, act)
    float(jnp.sum(r))  # fence
    dt = time.time() - t0
    finite = bool(jnp.all(jnp.isfinite(r)))
    print(f"PROBE OK {name} B={B}: {n * B / dt:.0f} env-steps/s, finite={finite}")


if __name__ == "__main__":
    main()
