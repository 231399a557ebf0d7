"""Demo import/export round trip (reference: mjrl demo pickles for DAPG)."""

import pickle

import numpy as np

from mjrl_tpu.utils.demos import batch_to_paths, load_demo_pickle, paths_to_batch


def _paths():
    rng = np.random.default_rng(0)
    return [
        dict(
            observations=rng.normal(size=(5, 3)),
            actions=rng.normal(size=(5, 2)),
            rewards=rng.normal(size=5),
            terminated=True,
        ),
        dict(
            observations=rng.normal(size=(8, 3)),
            actions=rng.normal(size=(8, 2)),
            rewards=rng.normal(size=8),
            terminated=False,
        ),
    ]


def test_pack_and_mask():
    paths = _paths()
    batch = paths_to_batch(paths)
    assert batch.observations.shape == (2, 8, 3)
    v = np.asarray(batch.valid)
    assert v[0].sum() == 5 and v[1].sum() == 8
    assert bool(batch.terminated[0, 4]) and not bool(batch.terminated[1, 7])
    np.testing.assert_allclose(
        np.asarray(batch.actions[0, :5]), paths[0]["actions"], rtol=1e-6
    )


def test_round_trip():
    paths = _paths()
    back = batch_to_paths(paths_to_batch(paths))
    for a, b in zip(paths, back):
        np.testing.assert_allclose(a["observations"], b["observations"], rtol=1e-6)
        np.testing.assert_allclose(a["rewards"], b["rewards"], rtol=1e-6)
        assert a["terminated"] == b["terminated"]


def test_load_pickle(tmp_path):
    p = tmp_path / "demos.pickle"
    with open(p, "wb") as f:
        pickle.dump(_paths(), f)
    batch = load_demo_pickle(str(p))
    assert batch.num_envs == 2
