"""Filter health diagnostics.

The reference's only failure handling is log-and-stop caps (SURVEY.md
section 5: 1 GB queue caps, `m_used_up` latches). A production filter needs
runtime health signals: effective sample size (degeneracy), weight entropy,
particle spread, and NaN detection, plus a recovery hook (uniform
reinitialization over free space — the augmented-MCL machinery reused as an
explicit kidnapped-robot/recovery action).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.models.mcl import MCLState
from slam_tpu.ops import resample


def filter_health(state: MCLState):
    """Pure jittable health summary of an MCL state.

    Returns a dict of scalars:
      ess_frac: effective sample size / N (1 = healthy, ->0 = degenerate)
      weight_entropy_frac: normalized weight entropy (1 = uniform)
      spread_x/spread_y: particle position stddev (collapse/divergence)
      any_nan: True if any pose/weight is non-finite
    """
    lw = state.particles.log_weight
    n = lw.shape[0]
    ess = resample.effective_sample_size(lw)
    w = jax.nn.softmax(lw)
    entropy = -jnp.sum(w * jnp.log(jnp.maximum(w, 1e-30)))
    pose = state.particles.pose
    finite = (
        jnp.all(jnp.isfinite(lw))
        & jnp.all(jnp.isfinite(pose.x))
        & jnp.all(jnp.isfinite(pose.y))
        & jnp.all(jnp.isfinite(pose.theta))
    )
    return {
        "ess_frac": ess / n,
        "weight_entropy_frac": entropy / jnp.log(float(n)),
        "spread_x": jnp.std(pose.x),
        "spread_y": jnp.std(pose.y),
        "any_nan": ~finite,
    }


def needs_recovery(health, ess_floor: float = 0.02, spread_ceiling: float | None = None):
    """Degeneracy / divergence trigger (host-side decision helper)."""
    bad = bool(health["any_nan"]) or float(health["ess_frac"]) < ess_floor
    if spread_ceiling is not None:
        bad = bad or (
            float(health["spread_x"]) > spread_ceiling
            or float(health["spread_y"]) > spread_ceiling
        )
    return bad


def recover(key, state: MCLState, blocked: jax.Array, fraction: float = 1.0) -> MCLState:
    """Recovery action: reinitialize a fraction of particles uniformly over
    free space with uniform weights (kidnapped-robot reset; the notebook's
    global-localization initialization, cell 9)."""
    n = state.particles.n
    particles = resample.inject_random_particles(
        key, state.particles, blocked, fraction
    )
    particles = particles.replace(
        log_weight=jnp.full((n,), -jnp.log(n), jnp.float32)
    )
    return state.replace(particles=particles)
