"""Optional SPH stabilization terms: XSPH and Monaghan artificial viscosity.

Framework extensions beyond the reference (BASELINE config 3 calls for a
water-column collapse "with XSPH/artificial viscosity"); the reference
itself has neither — its only stabilizers are the NaN trap and the position
clamp (VelPos.compute:143-154). Both terms are standard forms:

* XSPH (Monaghan 1989): advection-velocity smoothing
      dv_i = eps * sum_j (2 m / (rho_i + rho_j)) W_poly6(r_ij) (v_j - v_i)
  applied to the position update only (velocity state is untouched).
* Artificial viscosity (Monaghan 1992): for approaching pairs (v.r < 0)
      PI_ij = -alpha c h (v.r) / (|r|^2 + 0.01 h^2) / rho_bar
      f_i  += m^2 PI_ij grad_W_press(r_ij)
  (grad_W_press here is the reference's kernel, VelPos.compute:33-38, whose
  sign convention is already -grad W — positive radial — so a positive PI
  produces repulsion)
  with sound speed c = sqrt(gas_constant) (EOS dp/drho = k).

Both are extra passes over the same stale candidate structure the force
pass uses (fresh window center, stale table/density), enabled only when
their coefficients are nonzero, so the reference-faithful path is
bit-identical when disabled. Implemented for the packed-slotted backend
plus an all-pairs oracle for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EPSILON
from ..params import PhysParams
from . import sph_math
from .cellops import PackedSlots, _window_cells
from .grid import neighborhood_offsets


def xsph_slotted(pos: jax.Array, vel: jax.Array, rho: jax.Array,
                 slots: PackedSlots, capacity: int, p: PhysParams,
                 r: int, eps: float) -> jax.Array:
    """XSPH velocity correction dv (f32[N, 3]) via the packed slot layout."""
    c = capacity
    h2, h9 = p.h * p.h, p.h ** 9
    cell_fresh = sph_math.cell_index(pos, r)
    offs = neighborhood_offsets()

    def body(carry, off):
        ax, ay, az = carry
        ncid, valid = _window_cells(cell_fresh, off, r)
        prow = jnp.take(slots.posocc, ncid, axis=0)
        vrow = jnp.take(slots.velrho, ncid, axis=0)
        cx, cy, cz, occ = (prow[:, k * c:(k + 1) * c] for k in range(4))
        vx, vy, vz, rho_j = (vrow[:, k * c:(k + 1) * c] for k in range(4))
        # select-gating, not multiplicative (0 * inf = NaN would leak
        # NaN from empty slots / out-of-bounds cells; see cellops)
        gate = (occ > 0.0) & valid[:, None]
        dx = pos[:, 0:1] - cx
        dy = pos[:, 1:2] - cy
        dz = pos[:, 2:3] - cz
        w = sph_math.w_poly6(dx * dx + dy * dy + dz * dz, h2, h9)
        denom = rho[:, None] + rho_j
        coef = jnp.where(denom > EPSILON,
                         2.0 * p.mass / jnp.maximum(denom, EPSILON),
                         0.0) * w
        ax = ax + jnp.sum(jnp.where(gate, coef * (vx - vel[:, 0:1]), 0.0),
                          axis=-1)
        ay = ay + jnp.sum(jnp.where(gate, coef * (vy - vel[:, 1:2]), 0.0),
                          axis=-1)
        az = az + jnp.sum(jnp.where(gate, coef * (vz - vel[:, 2:3]), 0.0),
                          axis=-1)
        return (ax, ay, az), None

    zeros = jnp.zeros(pos.shape[0], jnp.float32)
    (ax, ay, az), _ = jax.lax.scan(body, (zeros,) * 3, offs)
    return jnp.float32(eps) * jnp.stack([ax, ay, az], -1)


def artificial_viscosity_slotted(pos: jax.Array, vel: jax.Array,
                                 rho: jax.Array, slots: PackedSlots,
                                 capacity: int, p: PhysParams, r: int,
                                 alpha: float) -> jax.Array:
    """Monaghan artificial-viscosity force (f32[N, 3])."""
    c = capacity
    h6 = p.h ** 6
    cs = jnp.sqrt(p.gas_constant)
    cell_fresh = sph_math.cell_index(pos, r)
    offs = neighborhood_offsets()

    def body(carry, off):
        fx, fy, fz = carry
        ncid, valid = _window_cells(cell_fresh, off, r)
        prow = jnp.take(slots.posocc, ncid, axis=0)
        vrow = jnp.take(slots.velrho, ncid, axis=0)
        cx, cy, cz, occ = (prow[:, k * c:(k + 1) * c] for k in range(4))
        vx, vy, vz, rho_j = (vrow[:, k * c:(k + 1) * c] for k in range(4))
        gate = (occ > 0.0) & valid[:, None]
        dx = pos[:, 0:1] - cx
        dy = pos[:, 1:2] - cy
        dz = pos[:, 2:3] - cz
        dvx = vel[:, 0:1] - vx
        dvy = vel[:, 1:2] - vy
        dvz = vel[:, 2:3] - vz
        vr = dvx * dx + dvy * dy + dvz * dz
        r2 = dx * dx + dy * dy + dz * dz
        rho_bar = 0.5 * (rho[:, None] + rho_j)
        mu = p.h * vr / (r2 + 0.01 * p.h * p.h)
        pi = jnp.where((vr < 0) & (rho_bar > EPSILON),
                       -jnp.float32(alpha) * cs * mu
                       / jnp.maximum(rho_bar, EPSILON), 0.0)
        abs_r = jnp.sqrt(r2)
        gwp = sph_math.grad_w_press_over_r(abs_r, p.h, h6)
        coef = p.mass * p.mass * pi * gwp
        fx = fx + jnp.sum(jnp.where(gate, coef * dx, 0.0), axis=-1)
        fy = fy + jnp.sum(jnp.where(gate, coef * dy, 0.0), axis=-1)
        fz = fz + jnp.sum(jnp.where(gate, coef * dz, 0.0), axis=-1)
        return (fx, fy, fz), None

    zeros = jnp.zeros(pos.shape[0], jnp.float32)
    (fx, fy, fz), _ = jax.lax.scan(body, (zeros,) * 3, offs)
    return jnp.stack([fx, fy, fz], -1)


# ---- all-pairs oracles (tests) ----


def xsph_bruteforce(pos, vel, rho, pair_mask, p: PhysParams, eps: float):
    h2, h9 = p.h * p.h, p.h ** 9
    diff = pos[:, None, :] - pos[None, :, :]
    w = sph_math.w_poly6(jnp.sum(diff * diff, -1), h2, h9)
    denom = rho[:, None] + rho[None, :]
    coef = jnp.where(pair_mask & (denom > EPSILON),
                     2.0 * p.mass / jnp.maximum(denom, EPSILON) * w, 0.0)
    dvel = vel[None, :, :] - vel[:, None, :]
    return jnp.float32(eps) * jnp.sum(coef[..., None] * dvel, axis=1)


def artificial_viscosity_bruteforce(pos, vel, rho, pair_mask, p: PhysParams,
                                    alpha: float):
    h6 = p.h ** 6
    cs = jnp.sqrt(p.gas_constant)
    diff = pos[:, None, :] - pos[None, :, :]
    dvel = vel[:, None, :] - vel[None, :, :]
    vr = jnp.sum(dvel * diff, -1)
    r2 = jnp.sum(diff * diff, -1)
    rho_bar = 0.5 * (rho[:, None] + rho[None, :])
    mu = p.h * vr / (r2 + 0.01 * p.h * p.h)
    pi = jnp.where((vr < 0) & (rho_bar > EPSILON) & pair_mask,
                   -jnp.float32(alpha) * cs * mu
                   / jnp.maximum(rho_bar, EPSILON), 0.0)
    gwp = sph_math.grad_w_press_over_r(jnp.sqrt(r2), p.h, h6)
    coef = p.mass * p.mass * pi * gwp
    return jnp.sum(coef[..., None] * diff, axis=1)
