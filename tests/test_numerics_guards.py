"""NaN surfacing guards (SURVEY.md §5.2: race detection / sanitizers).

XLA programs are data-race-free by construction; the remaining numerical
hazard class is NaN/Inf creep (unstable contacts, exploding advantages).
These tests run representative jitted programs under ``jax.debug_nans`` so
any NaN produced inside the fused step raises instead of propagating — and
prove, via a deliberately poisoned input, that the guard actually fires.
"""

import jax
import numpy as np
import pytest

from mjrl_tpu import envs
from mjrl_tpu.algos import NPG
from mjrl_tpu.models import GaussianMLP, QuadraticBaseline


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def test_npg_step_is_nan_free_under_debug_nans(debug_nans):
    env = envs.make("point_mass", horizon=8)
    policy = GaussianMLP(env.spec, hidden_sizes=(8, 8))
    agent = NPG(env, policy, QuadraticBaseline(env.spec), num_traj=8, horizon=8)
    state = agent.init(jax.random.PRNGKey(0))
    state, metrics = jax.jit(agent.train_step)(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["running_score"]))


def test_debug_nans_actually_fires(debug_nans):
    """Poisoned params must raise, proving the guard is live (not a no-op
    configuration): a silent pass here would mean the suite's NaN claims
    are vacuous."""
    env = envs.make("point_mass", horizon=8)
    policy = GaussianMLP(env.spec, hidden_sizes=(8, 8))
    agent = NPG(env, policy, QuadraticBaseline(env.spec), num_traj=8, horizon=8)
    state = agent.init(jax.random.PRNGKey(0))
    # poison on the host (numpy): device-side NaN *construction* would
    # itself trip debug_nans outside the assertion block
    bad_params = jax.tree.map(
        lambda x: np.full(x.shape, np.nan, x.dtype), state.params
    )
    state = state.replace(params=bad_params)
    with pytest.raises(Exception):  # FloatingPointError (or XLA runtime err)
        out = jax.jit(agent.train_step)(state, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
