"""Counter-based RNG streams.

The reference seeds a thrust minstd engine per thread from integer hashes of
(pass, pixel, depth) (Kernel/path_tracer_kernel.cu:35-44, 324, 415) — a design
forced by SIMT.  Here every lane's uniforms come from a threefry key folded
with (pass, stage, depth, pixel_id): fully deterministic, parallel-safe, no
stream correlation by construction, and — because the fold uses the *global*
pixel id, not the lane's position in a batch — identical no matter how the
wavefront is sharded across chips.

Each integrator stage consumes a fixed number of uniform "slots" per lane per
event, so a NumPy oracle can replay exactly the same numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# stage tags for fold_in (arbitrary distinct constants)
STAGE_RAYGEN = 0x1001
STAGE_BOUNCE = 0x2001
STAGE_RR = 0x3001


def pass_key(base_key: jax.Array, pass_index) -> jax.Array:
    return jax.random.fold_in(base_key, pass_index)


def _lane_uniforms(key: jax.Array, pixel_ids: jax.Array, slots: int) -> jax.Array:
    keys = jax.vmap(lambda pid: jax.random.fold_in(key, pid))(pixel_ids)
    return jax.vmap(lambda k: jax.random.uniform(k, (slots,), jnp.float32))(keys)


def raygen_uniforms(key: jax.Array, pixel_ids: jax.Array) -> jax.Array:
    """(P, 4): jitter_x, jitter_y, aperture_angle_u, aperture_radius_u.

    Jitter slots are in [-0.5, 0.5) as in the reference AA jitter
    (Kernel/path_tracer_kernel.cu:325-335); aperture slots in [0, 1).
    """
    u = _lane_uniforms(jax.random.fold_in(key, STAGE_RAYGEN), pixel_ids, 4)
    return u.at[:, :2].add(-0.5)


def bounce_uniforms(key: jax.Array, depth, pixel_ids: jax.Array) -> jax.Array:
    """(P, 6) uniforms in [0,1) for one bounce.

    Slot layout (fixed so the oracle can replay):
      0: medium free-flight distance
      1,2: medium scatter direction (sphere sample)
      3: fresnel lobe choice
      4,5: lobe direction sample (GGX or cosine hemisphere)
    """
    k = jax.random.fold_in(jax.random.fold_in(key, STAGE_BOUNCE), depth)
    return _lane_uniforms(k, pixel_ids, 6)


def rr_uniforms(key: jax.Array, depth, pixel_ids: jax.Array) -> jax.Array:
    """(P,) Russian-roulette survival uniforms for one bounce.

    A SEPARATE stage stream (not a 7th bounce slot) so enabling RR leaves
    every existing uniform value — and therefore every RR-off golden image —
    bit-identical.
    """
    k = jax.random.fold_in(jax.random.fold_in(key, STAGE_RR), depth)
    return _lane_uniforms(k, pixel_ids, 1)[:, 0]
