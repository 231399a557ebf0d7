"""TPU-vs-CPU backend parity sweep over every registered env.

Guards against backend miscompiles of the physics/step pipeline (we hit a
real one: the experimental axon TPU backend silently miscompiled a
gather-of-a-gather in passive_forces — wrong joint-limit torques, ~40% qdd
error on ant — found because SoA and engine disagreed ONLY on TPU; see
physics/engine.py:passive_forces). CI runs on CPU and cannot catch this
class of bug, so this script is the manual/driver-side check: for each env
it steps a batch of warm states through the SAME jitted program on both
backends and reports the max |q|/|qd| deviation, failing loudly above
tolerance.

Usage: python tools/tpu_parity_check.py [B] [steps]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpu = jax.devices("cpu")[0]
    try:
        acc = jax.devices()[0]
    except RuntimeError:
        print("no accelerator visible; nothing to compare")
        return
    if acc.platform == "cpu":
        print("default backend is CPU; nothing to compare")
        return

    from mjrl_tpu import envs

    failures = []
    # every registered env, plus the Newton-constraint variants of the two
    # locomotion envs that train on them (soa_newton.py TPU codegen check)
    cases = [(name, {}) for name in envs.registered_envs()]
    cases += [
        ("hopper", {"constraint_solver": "newton"}),
        ("walker2d", {"constraint_solver": "newton"}),
    ]
    for name, kw in cases:
        label = name + ("+newton" if kw else "")
        env = envs.make(name, horizon=n_steps + 1, **kw)
        keys = jax.random.split(jax.random.PRNGKey(0), B)

        def run(dev):
            with jax.default_device(dev):
                st, _ = jax.jit(jax.vmap(env.reset))(jax.device_put(keys, dev))
                step = jax.jit(jax.vmap(env.step))
                for i in range(n_steps):
                    a = jax.random.uniform(
                        jax.random.PRNGKey(i),
                        (B, env.spec.action_dim),
                        minval=-1.0,
                        maxval=1.0,
                    )
                    st, *_ = step(st, jax.device_put(a, dev))
                return jax.device_get(st)

        st_c = run(cpu)
        st_a = run(acc)
        leaves_c = jax.tree_util.tree_leaves(st_c)
        leaves_a = jax.tree_util.tree_leaves(st_a)
        d = max(
            float(np.abs(np.asarray(a) - np.asarray(c)).max())
            for a, c in zip(leaves_a, leaves_c)
        )
        scale = max(
            float(np.abs(np.asarray(c)).max()) for c in leaves_c
        )
        ok = d <= 1e-4 + 1e-4 * scale
        print(f"{label:20s} max|state diff| {d:.3e}  (state scale {scale:.2e})"
              f"  {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(label)
    if failures:
        raise SystemExit(f"backend parity FAILED for: {failures}")
    print("all envs: TPU and CPU agree")


if __name__ == "__main__":
    main()
