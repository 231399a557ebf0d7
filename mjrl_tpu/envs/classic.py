"""Analytic classic-control envs: pendulum swing-up and cartpole balance.

Contact-free, closed-form dynamics — cheap members of the env ladder between
point-mass and the rigid-body physics engine (SURVEY.md §7.2 step 2). The
continuous-action cartpole terminates on falling over, exercising the
``terminated``-aware GAE/masking path that the locomotion envs (hopper etc.)
will rely on (reference semantics: mjrl/samplers/core.py ``terminated`` flag).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.base import Env, StepResult, register
from mjrl_tpu.types import EnvSpec


class PendulumState(NamedTuple):
    theta: jax.Array  # angle from upright
    theta_dot: jax.Array


class PendulumEnv(Env):
    """Torque-limited pendulum swing-up (gym Pendulum-style reward shaping)."""

    def __init__(self, horizon: int = 200, dt: float = 0.05, g: float = 10.0,
                 m: float = 1.0, l: float = 1.0, max_torque: float = 2.0,
                 max_speed: float = 8.0):
        self.spec = EnvSpec(observation_dim=3, action_dim=1, horizon=horizon)
        self.dt, self.g, self.m, self.l = dt, g, m, l
        self.max_torque, self.max_speed = max_torque, max_speed

    def _obs(self, s: PendulumState) -> jax.Array:
        return jnp.stack([jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot])

    def reset(self, key: jax.Array) -> Tuple[PendulumState, jax.Array]:
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        s = PendulumState(theta, theta_dot)
        return s, self._obs(s)

    def step(self, s: PendulumState, action: jax.Array) -> StepResult:
        u = jnp.clip(action[0], -self.max_torque, self.max_torque)
        th = ((s.theta + jnp.pi) % (2.0 * jnp.pi)) - jnp.pi
        cost = th**2 + 0.1 * s.theta_dot**2 + 0.001 * u**2
        thdot = s.theta_dot + self.dt * (
            3.0 * self.g / (2.0 * self.l) * jnp.sin(s.theta)
            + 3.0 / (self.m * self.l**2) * u
        )
        thdot = jnp.clip(thdot, -self.max_speed, self.max_speed)
        new = PendulumState(s.theta + self.dt * thdot, thdot)
        info: Dict[str, jax.Array] = {
            "success": (jnp.abs(th) < 0.2).astype(jnp.float32)
        }
        return new, self._obs(new), -cost, jnp.zeros((), bool), info


class CartpoleState(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array


class CartpoleEnv(Env):
    """Continuous-force cartpole; terminates when the pole falls or the cart
    leaves the track (a true-termination env for GAE-mask testing)."""

    def __init__(self, horizon: int = 200, dt: float = 0.02, gravity: float = 9.8,
                 m_cart: float = 1.0, m_pole: float = 0.1, length: float = 0.5,
                 force_mag: float = 10.0, x_limit: float = 2.4,
                 theta_limit: float = 0.2095):
        self.spec = EnvSpec(observation_dim=4, action_dim=1, horizon=horizon)
        self.dt, self.gravity = dt, gravity
        self.m_cart, self.m_pole, self.length = m_cart, m_pole, length
        self.force_mag, self.x_limit, self.theta_limit = force_mag, x_limit, theta_limit

    def _obs(self, s: CartpoleState) -> jax.Array:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot])

    def reset(self, key: jax.Array) -> Tuple[CartpoleState, jax.Array]:
        v = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        s = CartpoleState(v[0], v[1], v[2], v[3])
        return s, self._obs(s)

    def step(self, s: CartpoleState, action: jax.Array) -> StepResult:
        force = self.force_mag * jnp.clip(action[0], -1.0, 1.0)
        total_m = self.m_cart + self.m_pole
        pm_l = self.m_pole * self.length
        cos_t, sin_t = jnp.cos(s.theta), jnp.sin(s.theta)
        temp = (force + pm_l * s.theta_dot**2 * sin_t) / total_m
        theta_acc = (self.gravity * sin_t - cos_t * temp) / (
            self.length * (4.0 / 3.0 - self.m_pole * cos_t**2 / total_m)
        )
        x_acc = temp - pm_l * theta_acc * cos_t / total_m
        new = CartpoleState(
            x=s.x + self.dt * s.x_dot,
            x_dot=s.x_dot + self.dt * x_acc,
            theta=s.theta + self.dt * s.theta_dot,
            theta_dot=s.theta_dot + self.dt * theta_acc,
        )
        terminated = jnp.logical_or(
            jnp.abs(new.x) > self.x_limit, jnp.abs(new.theta) > self.theta_limit
        )
        reward = jnp.asarray(1.0)
        info: Dict[str, jax.Array] = {"success": 1.0 - terminated.astype(jnp.float32)}
        return new, self._obs(new), reward, terminated, info


register("pendulum", PendulumEnv)
register("cartpole", CartpoleEnv)
