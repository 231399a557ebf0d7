"""Analytic 2-D point-mass reacher (the CPU-cheap smoke/parity env).

Capability twin of the reference's ``mjrl_point_mass-v0`` (reference:
mjrl/envs/point_mass.py, horizon 25): a force-controlled point mass must reach
a randomized target. Here the dynamics are closed-form (no contact), so the
env doubles as the framework's fastest correctness benchmark — config #1 in
BASELINE.json ("Point-mass reacher, NPG, Gaussian MLP(32,32) + quadratic
baseline, CPU-runnable").

Dynamics (semi-implicit Euler, damping):
    vel' = damping * vel + dt * clip(a, -1, 1) * gain
    pos' = pos + dt * vel'
Reward: ``-dist(pos', target) - ctrl_cost * ||a||^2``; success when the mass
is within ``success_radius`` of the target (reported via info['success'],
the reference's ``evaluate_success`` analogue).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.base import Env, StepResult, register
from mjrl_tpu.types import EnvSpec


class PointMassState(NamedTuple):
    pos: jax.Array  # (2,)
    vel: jax.Array  # (2,)
    target: jax.Array  # (2,)


class PointMassEnv(Env):
    def __init__(
        self,
        horizon: int = 25,
        dt: float = 0.1,
        gain: float = 10.0,
        damping: float = 0.9,
        ctrl_cost: float = 0.1,
        success_radius: float = 0.1,
        arena: float = 2.0,
    ):
        self.spec = EnvSpec(observation_dim=6, action_dim=2, horizon=horizon)
        self.dt = dt
        self.gain = gain
        self.damping = damping
        self.ctrl_cost = ctrl_cost
        self.success_radius = success_radius
        self.arena = arena

    def _obs(self, state: PointMassState) -> jax.Array:
        return jnp.concatenate([state.pos, state.vel, state.target - state.pos])

    def reset(self, key: jax.Array) -> Tuple[PointMassState, jax.Array]:
        kp, kt = jax.random.split(key)
        pos = jax.random.uniform(kp, (2,), minval=-self.arena, maxval=self.arena)
        target = jax.random.uniform(kt, (2,), minval=-self.arena, maxval=self.arena)
        state = PointMassState(pos=pos, vel=jnp.zeros(2), target=target)
        return state, self._obs(state)

    def step(self, state: PointMassState, action: jax.Array) -> StepResult:
        a = jnp.clip(action, -1.0, 1.0)
        vel = self.damping * state.vel + self.dt * self.gain * a
        pos = jnp.clip(state.pos + self.dt * vel, -2.0 * self.arena, 2.0 * self.arena)
        new_state = PointMassState(pos=pos, vel=vel, target=state.target)
        dist = jnp.linalg.norm(pos - state.target)
        reward = -dist - self.ctrl_cost * jnp.sum(jnp.square(a))
        success = (dist < self.success_radius).astype(jnp.float32)
        terminated = jnp.zeros((), dtype=bool)  # reach tasks run to horizon
        info: Dict[str, jax.Array] = {"success": success}
        return new_state, self._obs(new_state), reward, terminated, info

    # -- model-based acceleration hooks (algos/model_npg.py) ----------------
    # The reward is a function of (a, next_obs) alone, so imagined rollouts
    # through a learned dynamics model can score themselves (the reference's
    # model_accel needs the same per-task reward function).
    def reward_from_obs(self, obs, action, next_obs):
        a = jnp.clip(action, -1.0, 1.0)
        dist = jnp.linalg.norm(next_obs[..., 4:6], axis=-1)
        return -dist - self.ctrl_cost * jnp.sum(jnp.square(a), axis=-1)

    def terminated_from_obs(self, next_obs):
        return jnp.zeros(next_obs.shape[:-1], dtype=bool)


register("point_mass", PointMassEnv)
