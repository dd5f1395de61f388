"""Pallas TPU kernel: fused odometry motion-model sampling.

The predict phase draws 3 Gaussians per particle and integrates the pose
(`slam/motion.cpp:9-32`; jnp version in ops/motion.py). At 100k-1M particles
the jnp path materializes ~10 [N] intermediates in HBM; this kernel fuses
noise generation (on-core PRNG via `pltpu.prng_random_bits` + Box-Muller)
with the trig integration, one HBM read + write per pose component.

Statistically equivalent to ops/motion.py (same moments), not bitwise: the
noise stream comes from the per-core Pallas PRNG, not jax.random — the
equivalence test is on sample moments, like the reference's own notebook
validation (cell 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_tpu.core.stats import normalize_angle
from slam_tpu.core.types import Odometry, Pose

_ROWS = 256  # rows per grid program (256x128 = 32k particles)
_LANES = 128
_TWO_PI = 6.283185307179586


def _uniform01(shape):
    """(0, 1] uniforms from raw PRNG bits (top 24 bits -> float).

    Mosaic lacks a uint32->f32 cast; the 24-bit value fits int32 exactly,
    so shift as uint32 then bitcast to int32 before converting."""
    bits = pltpu.prng_random_bits(shape)
    u = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    return (u.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)


def _normal_pair(shape):
    """Two standard-normal draws per element (Box-Muller)."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    a = _TWO_PI * u2
    return r * jnp.cos(a), r * jnp.sin(a)


def _kernel(seed_ref, params_ref, x_ref, y_ref, th_ref, ox_ref, oy_ref, oth_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    r1 = params_ref[0]
    t = params_ref[1]
    r2 = params_ref[2]
    std_r1 = params_ref[3]
    std_t = params_ref[4]
    std_r2 = params_ref[5]

    shape = x_ref.shape
    n1, n2 = _normal_pair(shape)
    n3, _ = _normal_pair(shape)

    rot1 = r1 - n1 * std_r1
    trans = t - n2 * std_t
    rot2 = r2 - n3 * std_r2

    th = th_ref[...]
    ox_ref[...] = x_ref[...] + trans * jnp.cos(th + rot1)
    oy_ref[...] = y_ref[...] + trans * jnp.sin(th + rot1)
    oth_ref[...] = th + rot1 + rot2


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_motion_model_odometry_pallas(
    seed, odom: Odometry, pose: Pose, alphas, interpret: bool = False
) -> Pose:
    """Drop-in (statistical) replacement for
    ops.motion.sample_motion_model_odometry. `seed` is an int32 scalar (use
    e.g. jax.random.bits of the step key)."""
    a = jnp.asarray(alphas, jnp.float32)
    r1, t, r2 = (
        jnp.float32(odom.rot1),
        jnp.float32(odom.trans),
        jnp.float32(odom.rot2),
    )
    params = jnp.stack(
        [
            r1,
            t,
            r2,
            jnp.sqrt(a[0] * r1 * r1 + a[1] * t * t),
            jnp.sqrt(a[2] * t * t + a[3] * (r1 * r1 + r2 * r2)),
            jnp.sqrt(a[0] * r2 * r2 + a[1] * t * t),
        ]
    )

    n = pose.x.shape[0]
    tile = _ROWS * _LANES
    pad = (-n) % tile
    m = n + pad
    rows = m // _LANES
    x = jnp.pad(pose.x, (0, pad)).reshape(rows, _LANES)
    y = jnp.pad(pose.y, (0, pad)).reshape(rows, _LANES)
    th = jnp.pad(pose.theta, (0, pad)).reshape(rows, _LANES)
    grid = rows // _ROWS

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec,
            spec,
            spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), params, x, y, th)

    ox, oy, oth = (o.reshape(m)[:n] for o in out)
    return Pose(x=ox, y=oy, theta=normalize_angle(oth))
