"""EDT oracle tests: exact transform vs numpy brute force; JFA vs exact."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.ops.edt import edt_exact, edt_jfa


def brute_force_edt(blocked: np.ndarray) -> np.ndarray:
    h, w = blocked.shape
    ii, jj = np.mgrid[0:h, 0:w]
    obs = np.argwhere(blocked)
    if len(obs) == 0:
        return np.full((h, w), float(h + w))
    d2 = (ii[..., None] - obs[:, 0]) ** 2 + (jj[..., None] - obs[:, 1]) ** 2
    return np.minimum(np.sqrt(d2.min(-1)), h + w)


@pytest.mark.parametrize("shape", [(17, 23), (32, 32), (40, 9)])
def test_edt_exact_matches_brute_force(rng, shape):
    blocked = rng.random(shape) < 0.07
    got = np.asarray(edt_exact(jnp.asarray(blocked), block=8))
    want = brute_force_edt(blocked)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_edt_exact_empty_and_full(rng):
    empty = np.zeros((12, 12), bool)
    np.testing.assert_allclose(np.asarray(edt_exact(jnp.asarray(empty))), 24.0)
    full = np.ones((12, 12), bool)
    np.testing.assert_allclose(np.asarray(edt_exact(jnp.asarray(full))), 0.0)


@pytest.mark.parametrize("density", [0.02, 0.15])
def test_edt_jfa_close_to_exact(rng, density):
    blocked = rng.random((48, 64)) < density
    blocked[0, 0] = True  # never empty
    want = brute_force_edt(blocked)
    got = np.asarray(edt_jfa(jnp.asarray(blocked)))
    # JFA can only overestimate, and only slightly; blocked cells exact 0.
    assert np.all(got >= want - 1e-4)
    assert np.max(got - want) < 1.0
    assert np.all(got[blocked] == 0.0)
