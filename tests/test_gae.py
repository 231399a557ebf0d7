"""GAE/returns vs a numpy reimplementation of the reference's path-based math.

The oracle below is a direct numpy transcription of the behavior described in
SURVEY.md §2.1 for mjrl/utils/process_samples.py: per-path MC returns and
GAE with ``b1 = append(b, 0 if terminated else b[-1])`` bootstrap semantics.
The fixed-shape masked scans must agree exactly on padded batches.
"""

import jax.numpy as jnp
import numpy as np

from mjrl_tpu.ops.gae import (
    compute_gae,
    compute_returns,
    discount_sum,
    masked_mean_std,
)


def ref_discount_sum(x, gamma, terminal=0.0):
    y = np.zeros_like(x, dtype=np.float64)
    run = terminal
    for t in reversed(range(len(x))):
        run = x[t] + gamma * run
        y[t] = run
    return y


def ref_returns(rewards, gamma):
    return ref_discount_sum(np.asarray(rewards, np.float64), gamma)


def ref_gae(rewards, values, terminated, gamma, lam):
    """mjrl compute_advantages: b1 = append(b, 0 if terminated else b[-1])."""
    b = np.asarray(values, np.float64)
    r = np.asarray(rewards, np.float64)
    b1 = np.append(b, 0.0 if terminated else b[-1])
    td = r + gamma * b1[1:] - b1[:-1]
    return ref_discount_sum(td, gamma * lam)


def make_batch(paths, T):
    """Pack variable-length paths into (N, T) masked arrays."""
    N = len(paths)
    rewards = np.zeros((N, T), np.float32)
    values = np.zeros((N, T), np.float32)
    done = np.zeros((N, T), bool)
    term = np.zeros((N, T), bool)
    valid = np.zeros((N, T), bool)
    for i, p in enumerate(paths):
        L = len(p["rewards"])
        rewards[i, :L] = p["rewards"]
        values[i, :L] = p["values"]
        valid[i, :L] = True
        done[i, L - 1] = True
        term[i, L - 1] = p["terminated"]
    return tuple(map(jnp.asarray, (rewards, values, done, term, valid)))


def test_discount_sum_matches_reference():
    x = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    got = np.asarray(discount_sum(jnp.asarray(x), 0.9, terminal=5.0))
    np.testing.assert_allclose(got, ref_discount_sum(x, 0.9, 5.0), rtol=1e-6)


def test_returns_and_gae_padded_paths():
    rng = np.random.default_rng(0)
    T, gamma, lam = 8, 0.995, 0.97
    paths = [
        dict(rewards=rng.normal(size=8), values=rng.normal(size=8), terminated=False),
        dict(rewards=rng.normal(size=5), values=rng.normal(size=5), terminated=True),
        dict(rewards=rng.normal(size=3), values=rng.normal(size=3), terminated=False),
        dict(rewards=rng.normal(size=1), values=rng.normal(size=1), terminated=True),
    ]
    rewards, values, done, term, valid = make_batch(paths, T)

    rets = np.asarray(compute_returns(rewards, done, valid, gamma))
    advs = np.asarray(compute_gae(rewards, values, done, term, valid, gamma, lam))
    for i, p in enumerate(paths):
        L = len(p["rewards"])
        np.testing.assert_allclose(
            rets[i, :L], ref_returns(p["rewards"], gamma), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            advs[i, :L],
            ref_gae(p["rewards"], p["values"], p["terminated"], gamma, lam),
            rtol=1e-4,
            atol=1e-4,
        )
        # padding is exactly zero
        assert np.all(rets[i, L:] == 0.0)
        assert np.all(advs[i, L:] == 0.0)


def test_gae_multi_episode_row():
    """Auto-reset: one row holding two episodes must equal two separate paths."""
    gamma, lam = 0.99, 0.95
    p1 = dict(
        rewards=np.array([1.0, 0.5, -0.2]),
        values=np.array([0.3, 0.2, 0.1]),
        terminated=True,
    )
    p2 = dict(
        rewards=np.array([0.1, 0.7]),
        values=np.array([0.4, 0.5]),
        terminated=False,
    )
    rewards = jnp.asarray(np.concatenate([p1["rewards"], p2["rewards"]])[None, :]).astype(
        jnp.float32
    )
    values = jnp.asarray(np.concatenate([p1["values"], p2["values"]])[None, :]).astype(
        jnp.float32
    )
    done = jnp.asarray(np.array([[False, False, True, False, True]]))
    term = jnp.asarray(np.array([[False, False, True, False, False]]))
    valid = jnp.ones((1, 5), bool)

    advs = np.asarray(compute_gae(rewards, values, done, term, valid, gamma, lam))[0]
    want = np.concatenate(
        [
            ref_gae(p1["rewards"], p1["values"], True, gamma, lam),
            ref_gae(p2["rewards"], p2["values"], False, gamma, lam),
        ]
    )
    np.testing.assert_allclose(advs, want, rtol=1e-5, atol=1e-5)

    rets = np.asarray(compute_returns(rewards, done, valid, gamma))[0]
    want_r = np.concatenate(
        [ref_returns(p1["rewards"], gamma), ref_returns(p2["rewards"], gamma)]
    )
    np.testing.assert_allclose(rets, want_r, rtol=1e-5, atol=1e-5)


def test_masked_mean_std_ignores_padding():
    x = jnp.asarray(np.array([[1.0, 2.0, 100.0], [3.0, 4.0, -50.0]], np.float32))
    valid = jnp.asarray(np.array([[True, True, False], [True, True, False]]))
    mean, std = masked_mean_std(x, valid)
    np.testing.assert_allclose(np.asarray(mean), 2.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(std), np.std([1, 2, 3, 4]), rtol=1e-4)


def test_gae_window_tail_bootstraps_with_last_value():
    """A window that cuts an episode mid-flight (auto-reset sampling with
    num_steps < horizon) must bootstrap its tail with the last state's value
    (mjrl's truncated-path ``b[-1]`` semantics), not zero — a zero pad hands
    every window tail a huge negative advantage on high-value tasks."""
    import jax.numpy as jnp

    from mjrl_tpu.ops.gae import compute_gae

    rewards = jnp.array([[1.0, 1.0, 1.0]])
    values = jnp.array([[10.0, 11.0, 12.0]])
    done = jnp.zeros((1, 3), bool)          # window ends mid-episode
    terminated = jnp.zeros((1, 3), bool)
    valid = jnp.ones((1, 3), bool)
    gamma, lam = 0.9, 0.8
    adv = np.asarray(
        compute_gae(rewards, values, done, terminated, valid, gamma, lam)
    )[0]
    # hand-rolled: v_next = [11, 12, 12 (self-bootstrap)]
    d = [1 + 0.9 * 11 - 10, 1 + 0.9 * 12 - 11, 1 + 0.9 * 12 - 12]
    exp2 = d[2]
    exp1 = d[1] + gamma * lam * exp2
    exp0 = d[0] + gamma * lam * exp1
    np.testing.assert_allclose(adv, [exp0, exp1, exp2], rtol=1e-5)


def test_returns_bootstrap_value_on_window_tail():
    """``compute_returns(bootstrap_value=...)``: a row whose window truncates
    an episode mid-flight seeds the reverse scan with V(s_last); a row that
    ENDS with done is untouched (the done select zeroes the carry), so
    episode-mode semantics are identical whether or not a value is passed."""
    gamma = 0.9
    rewards = jnp.asarray(np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]], np.float32))
    done = jnp.asarray(np.array([[False, False, False], [False, False, True]]))
    valid = jnp.ones((2, 3), bool)
    boot = jnp.asarray(np.array([10.0, 10.0], np.float32))

    rets = np.asarray(compute_returns(rewards, done, valid, gamma, bootstrap_value=boot))
    # row 0 (truncated): y2 = 1 + g*10, y1 = 1 + g*y2, y0 = 1 + g*y1
    y2 = 1 + gamma * 10.0
    y1 = 1 + gamma * y2
    y0 = 1 + gamma * y1
    np.testing.assert_allclose(rets[0], [y0, y1, y2], rtol=1e-6)
    # row 1 (ends terminated): plain MC returns, bootstrap ignored
    np.testing.assert_allclose(rets[1], [1 + gamma * (1 + gamma), 1 + gamma, 1.0], rtol=1e-6)
    # and without a bootstrap the truncated row zero-pads (old behavior)
    rets0 = np.asarray(compute_returns(rewards, done, valid, gamma))
    np.testing.assert_allclose(rets0[0], [1 + gamma * (1 + gamma), 1 + gamma, 1.0], rtol=1e-6)
