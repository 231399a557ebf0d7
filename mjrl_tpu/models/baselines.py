"""Value-function baselines: zero, linear, quadratic, MLP.

Capability twins of the reference's baselines (reference:
mjrl/baselines/{zero,linear,quadratic,mlp}_baseline.py). All share the
reference's hand feature map: ``o = clip(obs, -10, 10) / 10``, episode-time
features ``al = t/1000`` with ``[o, o^2, al, al^2, al^3, 1]``; the quadratic
baseline appends the pairwise products ``o_i o_j (i <= j)`` — the "quadratic
value-function baseline" named in the north star. Fits regress against the
in-episode Monte-Carlo ``returns`` with padded steps masked out (weight 0),
and report the reference's relative errors ``sum((y - yhat)^2) / sum(y^2)``
as ``VF_error_before`` / ``VF_error_after``.

Linear/quadratic solve ridge normal equations on device (f32 Cholesky +
iterative refinement, escalating-ridge retries — see ops/lstsq.py) instead of
the reference's float64 ``np.linalg.lstsq``. The MLP baseline is an
optax-Adam minibatch fit expressed as a ``lax.scan`` over shuffled fixed-size
minibatches so the whole fit is one jitted program.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from mjrl_tpu.models.mlp import apply_mlp, identity_transforms, init_mlp
from mjrl_tpu.ops.lstsq import ridge_solve
from mjrl_tpu.types import EnvSpec, TrajectoryBatch

BaselineState = Any


def _base_features(obs: jax.Array, time: jax.Array) -> jax.Array:
    """The reference's shared feature map, shape ``(..., 2*do + 4)``."""
    o = jnp.clip(obs, -10.0, 10.0) / 10.0
    al = time.astype(o.dtype)[..., None] / 1000.0
    ones = jnp.ones_like(al)
    return jnp.concatenate([o, jnp.square(o), al, al**2, al**3, ones], axis=-1)


def _quadratic_features(obs: jax.Array, time: jax.Array) -> jax.Array:
    """Base features + upper-triangle pairwise products of scaled obs."""
    o = jnp.clip(obs, -10.0, 10.0) / 10.0
    do = o.shape[-1]
    iu, ju = jnp.triu_indices(do)
    pair = o[..., iu] * o[..., ju]
    return jnp.concatenate([_base_features(obs, time), pair], axis=-1)


def _relative_error(pred: jax.Array, target: jax.Array, w: jax.Array) -> jax.Array:
    num = jnp.sum(w * jnp.square(target - pred))
    den = jnp.sum(w * jnp.square(target)) + 1e-8
    return num / den


class Baseline(abc.ABC):
    """Functional baseline: static config object + explicit state pytree."""

    def __init__(self, spec: EnvSpec):
        self.spec = spec

    @abc.abstractmethod
    def init(self, key: jax.Array) -> BaselineState:
        ...

    @abc.abstractmethod
    def predict(self, state: BaselineState, obs: jax.Array, time: jax.Array) -> jax.Array:
        """V(s) for obs ``(..., do)`` and episode-time ``(...,)`` -> ``(...)``."""

    @abc.abstractmethod
    def fit(
        self, state: BaselineState, batch: TrajectoryBatch, key: jax.Array
    ) -> Tuple[BaselineState, Dict[str, jax.Array]]:
        """Fit against ``batch.returns`` (reference: ``baseline.fit(paths,
        return_errors=True)``); returns new state + error metrics."""

    def predict_batch(self, state: BaselineState, batch: TrajectoryBatch) -> jax.Array:
        return self.predict(state, batch.observations, batch.time)


class ZeroBaseline(Baseline):
    """Predicts 0 (ablation; reference: zero_baseline.py)."""

    def init(self, key):
        return ()

    def predict(self, state, obs, time):
        return jnp.zeros(obs.shape[:-1], obs.dtype)

    def fit(self, state, batch, key):
        zero = jnp.asarray(0.0)
        return state, {"VF_error_before": zero, "VF_error_after": zero}


class _LstsqBaseline(Baseline):
    """Shared closed-form ridge fit for the linear/quadratic baselines."""

    features = staticmethod(_base_features)

    def __init__(self, spec: EnvSpec, reg_coef: float = 1e-5):
        super().__init__(spec)
        self.reg_coef = reg_coef

    def _num_features(self) -> int:
        dummy = jnp.zeros(self.spec.observation_dim)
        return self.features(dummy, jnp.zeros((), jnp.int32)).shape[-1]

    def init(self, key):
        return {"coef": jnp.zeros(self._num_features())}

    def predict(self, state, obs, time):
        return self.features(obs, time) @ state["coef"]

    def fit(self, state, batch, key):
        feats = self.features(batch.observations, batch.time)
        m = batch.num_envs * batch.horizon
        feats = feats.reshape(m, -1)
        target = batch.returns.reshape(m)
        w = batch.valid.reshape(m).astype(target.dtype)
        err_before = _relative_error(feats @ state["coef"], target, w)
        coef = ridge_solve(feats, target, w, reg_coef=self.reg_coef)
        err_after = _relative_error(feats @ coef, target, w)
        return {"coef": coef}, {
            "VF_error_before": err_before,
            "VF_error_after": err_after,
        }


class LinearBaseline(_LstsqBaseline):
    """Reference: mjrl/baselines/linear_baseline.py."""


class QuadraticBaseline(_LstsqBaseline):
    """Reference: mjrl/baselines/quadratic_baseline.py."""

    features = staticmethod(_quadratic_features)


class MLPBaseline(Baseline):
    """Torch-Adam MLP value fn -> optax-Adam under ``lax.scan``.

    Reference defaults (mjrl/baselines/mlp_baseline.py): lr 1e-3, minibatch
    64, hidden (128, 128); ``epochs`` full passes per fit. ``batch_size``
    here is the per-fit minibatch size after flattening the (envs, time)
    axes; partial trailing minibatches are dropped by the reshape, matching
    the reference's iteration count to within one minibatch.
    """

    def __init__(
        self,
        spec: EnvSpec,
        learn_rate: float = 1e-3,
        reg_coef: float = 0.0,
        batch_size: int = 64,
        epochs: int = 1,
        hidden_sizes: Sequence[int] = (128, 128),
        vf_clip_coef: float = 0.0,
    ):
        super().__init__(spec)
        self.learn_rate = learn_rate
        self.reg_coef = reg_coef
        self.batch_size = batch_size
        self.epochs = epochs
        self.hidden_sizes = tuple(hidden_sizes)
        # Optional PPO-style value-loss clipping (default off = reference
        # behavior): loss = max((v-y)^2, (v_clip-y)^2) with
        # v_clip = v_old + clip(v - v_old, +-eps) and v_old the PRE-fit
        # prediction. eps = vf_clip_coef * std(targets) so the knob is
        # return-scale-free (the classic absolute eps is meaningless across
        # envs whose returns differ by orders of magnitude).
        self.vf_clip_coef = vf_clip_coef
        self.optimizer = optax.adam(learn_rate)

    def _num_features(self) -> int:
        dummy = jnp.zeros(self.spec.observation_dim)
        return _base_features(dummy, jnp.zeros((), jnp.int32)).shape[-1]

    def init(self, key):
        sizes = (self._num_features(), *self.hidden_sizes, 1)
        params = init_mlp(key, sizes, final_scale=1.0)
        return {
            "mlp": params,
            "opt_state": self.optimizer.init(params),
            "transforms": identity_transforms(self._num_features(), 1),
        }

    def predict(self, state, obs, time):
        feats = _base_features(obs, time)
        out = apply_mlp(state["mlp"], state["transforms"], feats, jnp.tanh)
        return out[..., 0]

    def fit(self, state, batch, key):
        m = batch.num_envs * batch.horizon
        feats = _base_features(batch.observations, batch.time).reshape(m, -1)
        target = batch.returns.reshape(m)
        w = batch.valid.reshape(m).astype(target.dtype)

        pred0 = apply_mlp(state["mlp"], state["transforms"], feats, jnp.tanh)[..., 0]
        err_before = _relative_error(pred0, target, w)
        if self.vf_clip_coef > 0.0:
            n = jnp.maximum(jnp.sum(w), 1.0)
            t_mu = jnp.sum(target * w) / n
            t_std = jnp.sqrt(jnp.sum(jnp.square(target - t_mu) * w) / n + 1e-8)
            vf_eps = self.vf_clip_coef * t_std
        else:
            vf_eps = 0.0

        def loss_fn(params, f, y, ww, v_old):
            pred = apply_mlp(params, state["transforms"], f, jnp.tanh)[..., 0]
            sq = jnp.square(pred - y)
            if self.vf_clip_coef > 0.0:
                v_clip = v_old + jnp.clip(pred - v_old, -vf_eps, vf_eps)
                sq = jnp.maximum(sq, jnp.square(v_clip - y))
            mse = jnp.sum(ww * sq) / jnp.maximum(jnp.sum(ww), 1.0)
            if self.reg_coef > 0.0:
                l2 = sum(jnp.sum(jnp.square(p["w"])) for p in params)
                mse = mse + self.reg_coef * l2
            return mse

        mb = min(self.batch_size, m)
        num_mb = max(m // mb, 1)

        def epoch(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, m)[: num_mb * mb].reshape(num_mb, mb)

            def mb_step(c, idx):
                p, o = c
                g = jax.grad(loss_fn)(
                    p, feats[idx], target[idx], w[idx], pred0[idx]
                )
                updates, o = self.optimizer.update(g, o, p)
                return (optax.apply_updates(p, updates), o), ()

            carry, _ = jax.lax.scan(mb_step, (params, opt_state), perm)
            return carry, ()

        (params, opt_state), _ = jax.lax.scan(
            epoch,
            (state["mlp"], state["opt_state"]),
            jax.random.split(key, self.epochs),
        )
        err_after = _relative_error(
            apply_mlp(params, state["transforms"], feats, jnp.tanh)[..., 0], target, w
        )
        new_state = {**state, "mlp": params, "opt_state": opt_state}
        return new_state, {
            "VF_error_before": err_before,
            "VF_error_after": err_after,
        }
