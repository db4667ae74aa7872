"""Brute-force O(N²) density and force passes — the behavioral oracle.

The reference has no tests; its grid-gathered physics is validated here
against all-pairs computation (SURVEY.md §4). These functions reproduce the
reference's *semantics* exactly, including:

* the 27-cell candidate window: a pair (i, j) is considered iff j's
  frame-start ("stale") voxel lies in the 3×3×3 window around i's *current*
  voxel (Density.compute:42-52, VelPos.compute:67-81 — VelPos recomputes
  ``idx_3d`` from the fresh position each substep but walks the stale bucket);
* self-interaction included in density (no j==i skip — Density.compute:50-55)
  but excluded from forces (VelPos.compute:82);
* the per-voxel capacity drop: particles whose in-cell rank exceeds the
  32-slot capacity never enter the bucket and are invisible as neighbors
  (Bucket.compute:30-35) — emulated via ``bucket_mask``;
* the ρ_j > ε guard inside the pair loop and the ρ_i > ε guard on the final
  scaling (VelPos.compute:91-105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EPSILON
from ..params import PhysParams
from . import sph_math


def _decompose_cell(cell_id: jax.Array, r: int) -> jax.Array:
    """Invert the flat index x + y·R + z·R² (Bucket.compute:28).

    The reference stores particles by FLAT id with no 3D bounds check on
    insertion, so an out-of-range component aliases into a neighboring cell
    (e.g. x=R wraps to (0, y+1, z)). The oracle must therefore compare
    against the *decomposed* flat id, not the raw 3D cell.
    """
    x = cell_id % r
    y = (cell_id // r) % r
    z = cell_id // (r * r)
    return jnp.stack([x, y, z], axis=-1)


def _window_mask(cell_i: jax.Array, cell_id_j: jax.Array, visible_j: jax.Array,
                 r: int) -> jax.Array:
    """[N_i, N_j] bool — j's bucket cell lies in the 3×3×3 window around i's
    (possibly out-of-range) cell. Window cells outside [0,R)³ are dropped by
    the reference's bounds check (Density.compute:46); since decomposed j
    cells are always in range, plain Chebyshev distance on the decomposed
    cell realizes exactly that."""
    cell_j = _decompose_cell(jnp.clip(cell_id_j, 0, r * r * r - 1), r)
    d = cell_i[:, None, :] - cell_j[None, :, :]
    return (jnp.max(jnp.abs(d), axis=-1) <= 1) & visible_j[None, :]


def density_bruteforce(pos: jax.Array, stale_cell_id: jax.Array,
                       bucket_mask: jax.Array, p: PhysParams,
                       bucket_resolution: int) -> jax.Array:
    """ρ_i = Σ_j m·W_poly6(pos_i − pos_j) over bucket-visible window pairs.

    Mirrors Density.compute:32-60 (self term included).
    ``stale_cell_id`` is the FLAT frame-start cell id per particle.
    """
    h2 = p.h * p.h
    h9 = p.h ** 9
    cell_i = sph_math.cell_index(pos, bucket_resolution)
    mask = _window_mask(cell_i, stale_cell_id, bucket_mask, bucket_resolution)
    diff = pos[:, None, :] - pos[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    w = sph_math.w_poly6(r2, h2, h9)
    return jnp.sum(jnp.where(mask, p.mass * w, 0.0), axis=-1)


def fluid_forces_bruteforce(pos: jax.Array, vel: jax.Array, rho: jax.Array,
                            stale_cell_id: jax.Array, bucket_mask: jax.Array,
                            p: PhysParams, bucket_resolution: int) -> jax.Array:
    """Pressure + viscosity forces, all-pairs (VelPos.compute:64-105).

    ``rho`` is the frame-start (stale) density; ``pos``/``vel`` are fresh.
    Returns f32[N, 3] = f_press + f_vis after the m²/ρ_i scaling.
    """
    n = pos.shape[0]
    h6 = p.h ** 6
    cell_i = sph_math.cell_index(pos, bucket_resolution)
    pair_ok = _window_mask(cell_i, stale_cell_id, bucket_mask, bucket_resolution)
    pair_ok = pair_ok & ~jnp.eye(n, dtype=bool)  # skip j == i (VelPos.compute:82)

    pressure = sph_math.eos_pressure(rho, p.gas_constant, p.rest_density)
    rho_ok = rho > EPSILON  # per-j guard (VelPos.compute:91)
    safe_rho = jnp.where(rho_ok, rho, 1.0)

    diff = pos[:, None, :] - pos[None, :, :]           # pos_i − pos_j
    gwp = sph_math.grad_w_press(diff, p.h, h6)          # [N, N, 3]
    gwv = sph_math.grad_w_vis(diff, p.h, h6)            # [N, N]

    m = pair_ok & rho_ok[None, :]
    press_coef = (pressure[:, None] + pressure[None, :]) / (2.0 * safe_rho[None, :])
    f_press = jnp.sum(jnp.where(m[..., None], press_coef[..., None] * gwp, 0.0), axis=1)

    dvel = vel[None, :, :] - vel[:, None, :]            # v_j − v_i
    vis_coef = gwv / safe_rho[None, :]
    f_vis = jnp.sum(jnp.where(m[..., None], vis_coef[..., None] * dvel, 0.0), axis=1)

    # Final scaling, guarded by ρ_i > ε (VelPos.compute:101-105): when the
    # guard fails the raw sums pass through unscaled, as in the reference.
    i_ok = (rho > EPSILON)[:, None]
    f_press = jnp.where(i_ok, f_press * (p.mass * p.mass / safe_rho[:, None]), f_press)
    f_vis = jnp.where(i_ok, f_vis * (p.viscosity * p.mass * p.mass / safe_rho[:, None]),
                      f_vis)
    return f_press + f_vis
