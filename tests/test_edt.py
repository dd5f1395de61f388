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


class TestJFARefresh:
    """Incremental capped-JFA refresh (round 5, `edt_jfa_refresh`): bitwise
    equality with the full rebuild — by the reach bound, not sampling."""

    CAP = 3.0  # reach = ceil(3)+1 = 4, so box must exceed 16

    def _refresh(self, old, new, box=48):
        from slam_tpu.ops.edt import edt_capped, edt_refresh

        prev = edt_capped(jnp.asarray(old), self.CAP)
        got = edt_refresh(
            prev, jnp.asarray(old), jnp.asarray(new),
            max_dist=self.CAP, box=box,
        )
        want = edt_capped(jnp.asarray(new), self.CAP)
        return np.asarray(got), np.asarray(want), prev

    def _plan(self, old, new, box=48):
        from slam_tpu.ops.edt import _refresh_plan, edt_capped_reach

        return _refresh_plan(
            jnp.asarray(old), jnp.asarray(new),
            reach=edt_capped_reach(self.CAP), box=box,
        )

    def test_reach_value(self):
        from slam_tpu.ops.edt import edt_capped_reach, jfa_reach

        assert edt_capped_reach(3.0) == 4
        assert edt_capped_reach(27.0) == 28
        # The JFA's (looser) bound, kept for the uncapped transform:
        # cap 3 -> s0 = 4, steps [4,2,1,1] -> reach 8
        assert jfa_reach(3.0) == 8
        assert jfa_reach(27.0) == 64

    def test_local_edit_bitwise(self, rng):
        old = rng.random((96, 128)) < 0.03
        new = old.copy()
        new[50:54, 60:66] ^= True  # flips both ways (add + remove seeds)
        got, want, _ = self._refresh(old, new)
        np.testing.assert_array_equal(got, want)
        any_diff, fits, _, _ = self._plan(old, new)
        assert bool(any_diff) and bool(fits)  # the WINDOW path ran

    def test_no_edit_returns_prev_untouched(self, rng):
        old = rng.random((96, 128)) < 0.03
        got, want, prev = self._refresh(old, old.copy())
        np.testing.assert_array_equal(got, np.asarray(prev))
        np.testing.assert_array_equal(got, want)

    def test_wide_edit_falls_back_bitwise(self, rng):
        old = rng.random((96, 128)) < 0.03
        new = old.copy()
        new[2, 2] ^= True
        new[90, 120] ^= True  # opposite corners: cannot fit any window
        got, want, _ = self._refresh(old, new)
        np.testing.assert_array_equal(got, want)
        any_diff, fits, _, _ = self._plan(old, new)
        assert bool(any_diff) and not bool(fits)

    @pytest.mark.parametrize("corner", [(0, 0), (0, 120), (92, 0), (92, 120)])
    def test_map_edge_edits_bitwise(self, rng, corner):
        """Edits at map corners: the window sits flush with the map edge,
        where the composite interior extends to the edge (chains clip
        identically) — still bitwise and still the window path."""
        old = rng.random((96, 128)) < 0.03
        new = old.copy()
        i, j = corner
        new[i : i + 4, j : j + 6] ^= True
        got, want, _ = self._refresh(old, new)
        np.testing.assert_array_equal(got, want)
        any_diff, fits, _, _ = self._plan(old, new)
        assert bool(any_diff) and bool(fits)

    def test_seed_removal_resaturates(self):
        """Removing the ONLY seed in a region must resaturate cells to the
        sentinel through the window path (the window rebuild starts from
        scratch, not from the stale field)."""
        old = np.zeros((96, 128), bool)
        old[48, 64] = True
        old[10, 10] = True  # a far seed that stays
        new = old.copy()
        new[48, 64] = False
        got, want, _ = self._refresh(old, new)
        np.testing.assert_array_equal(got, want)
        assert got[48, 64] > self.CAP  # saturated again

    def test_randomized_edit_sweep(self, rng):
        """Randomized placements and sizes, both fitting and not: always
        bitwise equal to the full rebuild."""
        from slam_tpu.ops.edt import edt_capped as edt_jfa
        from slam_tpu.ops.edt import edt_refresh as edt_jfa_refresh

        old = rng.random((80, 96)) < 0.05
        for _ in range(12):
            new = old.copy()
            ei = rng.integers(0, 76)
            ej = rng.integers(0, 92)
            eh = int(rng.integers(1, 24))
            ew = int(rng.integers(1, 24))
            new[ei : ei + eh, ej : ej + ew] ^= rng.random((min(eh, 80 - ei), min(ew, 96 - ej))) < 0.3
            prev = edt_jfa(jnp.asarray(old), self.CAP)
            got = edt_jfa_refresh(
                prev, jnp.asarray(old), jnp.asarray(new),
                max_dist=self.CAP, box=40,
            )
            want = edt_jfa(jnp.asarray(new), self.CAP)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            old = new  # chain: the refreshed field is the next prev

    def test_validation(self):
        from slam_tpu.ops.edt import edt_capped, edt_refresh

        old = jnp.zeros((64, 64), bool)
        prev = edt_capped(old, self.CAP)
        with pytest.raises(ValueError, match="4\\*reach"):
            edt_refresh(prev, old, old, max_dist=self.CAP, box=16)
        with pytest.raises(ValueError, match="exceeds map dims"):
            edt_refresh(prev, old, old, max_dist=self.CAP, box=80)


def test_edt_capped_exact_within_cap(rng):
    """edt_capped is EXACT within the cap (not JFA-approximate): equal to
    the exact transform wherever the true distance <= cap, and every
    beyond-cap cell reads > cap (blocked cells exactly 0)."""
    from slam_tpu.ops import edt

    blocked = jnp.asarray(rng.random((96, 128)) < 0.02)
    blocked = blocked.at[40, 60].set(True)
    for cap in (5.0, 12.0, 27.0):
        full = np.asarray(edt.edt_exact(blocked))
        got = np.asarray(edt.edt_capped(blocked, cap))
        near = full <= cap
        np.testing.assert_allclose(got[near], full[near], rtol=1e-5)
        assert np.all(got[~near] > cap)
        assert np.all(got[np.asarray(blocked)] == 0.0)
