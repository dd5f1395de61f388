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


def test_jfa_capped_matches_exact_within_cap(rng):
    """Range-capped JFA: exact (same JFA+1 quality) below the cap,
    saturated to the h+w sentinel beyond it."""
    import jax.numpy as jnp

    from slam_tpu.ops import edt

    blocked = jnp.asarray(rng.random((96, 128)) > 0.995)
    blocked = blocked.at[40, 60].set(True)  # at least one seed
    cap = 12.0
    full = np.asarray(edt.edt_exact(blocked))
    capped = np.asarray(edt.edt_jfa(blocked, max_dist=cap))
    near = full <= cap
    # Same JFA+1 quality as the uncapped transform: tiny rare
    # overestimates only (see test_edt_jfa_close_to_exact).
    assert np.all(capped[near] >= full[near] - 1e-4)
    assert np.max(capped[near] - full[near]) < 1.0
    # Beyond the propagation radius values only ever exceed the true
    # distance (saturating at h+w) — never underestimate.
    far = full > cap
    assert np.all(capped[far] >= full[far] - 1e-3)
