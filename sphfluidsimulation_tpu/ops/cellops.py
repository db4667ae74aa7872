"""Grid-gathered density and force passes (XLA gather formulation).

Replaces the reference's per-thread 27-voxel × 32-slot walk
(Density.compute:42-57, VelPos.compute:67-98) with a static-shaped
fixed-fanout gather: a `lax.scan` over the 27 cell offsets, each step
gathering one voxel's C candidate slots for every particle. Shapes are fully
static — the TPU requirement — and out-of-range cells / empty slots are
masked, reproducing the reference's bounds check (Density.compute:46) and
sentinel break (:52).

The ``*_rows`` variants compute results for a contiguous row block of
particles against the full candidate arrays — the building block for
spatial domain decomposition (each device computes its own rows after an
all_gather of the candidate source arrays).

This is the correctness tier (BASELINE configs 2-3); the Pallas cell-blocked
kernel is the throughput tier.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EPSILON
from . import sph_math
from ..params import PhysParams
from .grid import Bucket, flat_cell_id, neighborhood_offsets


def _offset_candidates(table: jax.Array, cell_rows: jax.Array, off: jax.Array,
                       r: int, capacity: int, n: int) -> jax.Array:
    """Candidate particle ids in voxel (cell_rows + off) — i32[rows, C],
    sentinel n for empty/out-of-range (bounds check Density.compute:46)."""
    ncell = cell_rows + off[None, :]
    valid = jnp.all((ncell >= 0) & (ncell < r), axis=-1)
    ncid = jnp.where(valid, flat_cell_id(ncell, r), 0)
    slots = ncid[:, None] * capacity + jnp.arange(capacity, dtype=jnp.int32)[None, :]
    cand = table[slots]
    return jnp.where(valid[:, None], cand, n)


def density_grid_rows(pos_rows: jax.Array, cell_rows: jax.Array,
                      pos_all: jax.Array, table: jax.Array, capacity: int,
                      p: PhysParams, bucket_resolution: int) -> jax.Array:
    """ρ for a row block via the voxel table (Density.compute:32-60; the
    self term is included — no j==i skip)."""
    n = pos_all.shape[0]
    h2, h9 = p.h * p.h, p.h ** 9
    offs = neighborhood_offsets()

    def body(rho, off):
        cand = _offset_candidates(table, cell_rows, off, bucket_resolution,
                                  capacity, n)
        ok = cand < n
        j = jnp.minimum(cand, n - 1)
        diff = pos_rows[:, None, :] - pos_all[j]
        r2 = jnp.sum(diff * diff, axis=-1)
        w = sph_math.w_poly6(r2, h2, h9)
        return rho + jnp.sum(jnp.where(ok, p.mass * w, 0.0), axis=-1), None

    rho, _ = jax.lax.scan(body, jnp.zeros(pos_rows.shape[0], jnp.float32), offs)
    return rho


def fluid_forces_grid_rows(pos_rows: jax.Array, vel_rows: jax.Array,
                           ids_rows: jax.Array, rho_rows: jax.Array,
                           pos_all: jax.Array, vel_all: jax.Array,
                           rho_all: jax.Array, table: jax.Array,
                           capacity: int, p: PhysParams,
                           bucket_resolution: int) -> jax.Array:
    """Pressure + viscosity for a row block (VelPos.compute:49-105).

    ``pos/vel`` are fresh (current substep); ``rho`` and the table are
    frame-start stale. The candidate window is centered on the *fresh* cell
    of each row (VelPos.compute:57-58 recomputes idx_3d each substep).
    ``ids_rows`` are global particle ids for the j==i skip (VelPos:82).
    """
    n = pos_all.shape[0]
    h6 = p.h ** 6
    cell_fresh = sph_math.cell_index(pos_rows, bucket_resolution)
    press_rows = sph_math.eos_pressure(rho_rows, p.gas_constant, p.rest_density)
    press_all = sph_math.eos_pressure(rho_all, p.gas_constant, p.rest_density)
    offs = neighborhood_offsets()

    def body(carry, off):
        f_press, f_vis = carry
        cand = _offset_candidates(table, cell_fresh, off, bucket_resolution,
                                  capacity, n)
        ok = (cand < n) & (cand != ids_rows[:, None])  # skip j==i (VelPos:82)
        j = jnp.minimum(cand, n - 1)
        rho_j = rho_all[j]
        ok = ok & (rho_j > EPSILON)                    # VelPos.compute:91
        safe_rho = jnp.where(rho_j > EPSILON, rho_j, 1.0)
        diff = pos_rows[:, None, :] - pos_all[j]
        gwp = sph_math.grad_w_press(diff, p.h, h6)
        gwv = sph_math.grad_w_vis(diff, p.h, h6)
        press_coef = (press_rows[:, None] + press_all[j]) / (2.0 * safe_rho)
        dfp = jnp.sum(jnp.where(ok[..., None], press_coef[..., None] * gwp, 0.0), 1)
        dvel = vel_all[j] - vel_rows[:, None, :]
        vis_coef = gwv / safe_rho
        dfv = jnp.sum(jnp.where(ok[..., None], vis_coef[..., None] * dvel, 0.0), 1)
        return (f_press + dfp, f_vis + dfv), None

    zero = jnp.zeros_like(pos_rows)
    (f_press, f_vis), _ = jax.lax.scan(body, (zero, zero), offs)

    # Final scaling, guarded by ρ_i > ε (VelPos.compute:101-105).
    i_ok = (rho_rows > EPSILON)[:, None]
    safe_rho_i = jnp.where(rho_rows > EPSILON, rho_rows, 1.0)[:, None]
    f_press = jnp.where(i_ok, f_press * (p.mass * p.mass / safe_rho_i), f_press)
    f_vis = jnp.where(i_ok, f_vis * (p.viscosity * p.mass * p.mass / safe_rho_i),
                      f_vis)
    return f_press + f_vis


def density_grid(pos: jax.Array, bucket: Bucket, capacity: int,
                 p: PhysParams, bucket_resolution: int) -> jax.Array:
    """Full-array wrapper of :func:`density_grid_rows`."""
    return density_grid_rows(pos, bucket.cell, pos, bucket.table, capacity,
                             p, bucket_resolution)


def fluid_forces_grid(pos: jax.Array, vel: jax.Array, rho: jax.Array,
                      bucket: Bucket, capacity: int, p: PhysParams,
                      bucket_resolution: int) -> jax.Array:
    """Full-array wrapper of :func:`fluid_forces_grid_rows`."""
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)
    return fluid_forces_grid_rows(pos, vel, ids, rho, pos, vel, rho,
                                  bucket.table, capacity, p,
                                  bucket_resolution)


# ---------------------------------------------------------------------------
# Slotted ("tier B") formulation: identical semantics, TPU-friendly access.
#
# The naive formulation above random-gathers every candidate's pos/vel/rho
# per (particle x offset x slot) — 27·C element gathers per particle per
# pass, the access pattern TPUs are worst at. Here particle values are first
# scattered into the table's own cell-major slot layout ([R³, C, ...], one
# row gather of the whole table per field), after which every candidate
# lookup becomes a *row* gather of C contiguous slots — 27 row gathers per
# particle per pass with 128-512 B rows, which XLA lowers to efficient
# strided DMA. Results are bit-identical to the naive formulation (same
# candidates, same summation order over offsets and slots).
# ---------------------------------------------------------------------------


class SlottedFrame(NamedTuple):
    """Per-frame cell-major slot arrays (stale, built once per frame).
    A pytree, so it rides scan carries / jit boundaries.

    id_slots:  i32[R³, C] particle ids (sentinel n)
    ok_slots:  bool[R³, C] occupied mask (prefix-dense per row by build)
    rho_slots: f32[R³, C] stale density per slot
    """

    id_slots: jax.Array
    ok_slots: jax.Array
    rho_slots: jax.Array


def _window_cells(cell_rows: jax.Array, off: jax.Array, r: int
                  ) -> tuple[jax.Array, jax.Array]:
    """(clipped flat cell id, validity) of the window cell at ``off``."""
    ncell = cell_rows + off[None, :]
    valid = jnp.all((ncell >= 0) & (ncell < r), axis=-1)
    ncid = jnp.where(valid, flat_cell_id(ncell, r), 0)
    return ncid, valid


def slot_frame(bucket_table: jax.Array, rho_all: jax.Array, n: int,
               capacity: int) -> SlottedFrame:
    """Build the frame's slot arrays from the bucket table + stale density."""
    id_slots = bucket_table.reshape(-1, capacity)
    ok_slots = id_slots < n
    j = jnp.minimum(id_slots, n - 1)
    rho_slots = jnp.where(ok_slots, rho_all[j], 0.0)
    return SlottedFrame(id_slots, ok_slots, rho_slots)


def slot_values(frame: SlottedFrame, n: int, *arrays: jax.Array
                ) -> list[jax.Array]:
    """Scatter fresh per-particle values into slot layout ([R³, C, ...])."""
    j = jnp.minimum(frame.id_slots, n - 1)
    out = []
    for a in arrays:
        v = a[j]
        mask = frame.ok_slots.reshape(frame.ok_slots.shape + (1,) * (a.ndim - 1))
        out.append(jnp.where(mask, v, 0.0))
    return out


def density_slotted_rows(pos_rows: jax.Array, cell_rows: jax.Array,
                         frame: SlottedFrame, pos_slots: jax.Array,
                         p: PhysParams, bucket_resolution: int) -> jax.Array:
    """ρ for a row block via slot-row gathers (Density.compute:32-60
    semantics: self term included, bounds check per window cell)."""
    h2, h9 = p.h * p.h, p.h ** 9
    offs = neighborhood_offsets()

    def body(rho, off):
        ncid, valid = _window_cells(cell_rows, off, bucket_resolution)
        cand_pos = jnp.take(pos_slots, ncid, axis=0)       # [rows, C, 3]
        ok = jnp.take(frame.ok_slots, ncid, axis=0) & valid[:, None]
        diff = pos_rows[:, None, :] - cand_pos
        r2 = jnp.sum(diff * diff, axis=-1)
        w = sph_math.w_poly6(r2, h2, h9)
        return rho + jnp.sum(jnp.where(ok, p.mass * w, 0.0), axis=-1), None

    rho, _ = jax.lax.scan(body, jnp.zeros(pos_rows.shape[0], jnp.float32),
                          offs)
    return rho


def fluid_forces_slotted_rows(pos_rows: jax.Array, vel_rows: jax.Array,
                              ids_rows: jax.Array, rho_rows: jax.Array,
                              frame: SlottedFrame, pos_slots: jax.Array,
                              vel_slots: jax.Array, p: PhysParams,
                              bucket_resolution: int) -> jax.Array:
    """Pressure + viscosity for a row block via slot-row gathers
    (VelPos.compute:49-105 semantics: fresh window center, stale table/ρ,
    j==i skip, ρ guards, final m²/ρ_i scaling)."""
    h6 = p.h ** 6
    cell_fresh = sph_math.cell_index(pos_rows, bucket_resolution)
    press_rows = sph_math.eos_pressure(rho_rows, p.gas_constant,
                                       p.rest_density)
    offs = neighborhood_offsets()

    def body(carry, off):
        f_press, f_vis = carry
        ncid, valid = _window_cells(cell_fresh, off, bucket_resolution)
        cand_id = jnp.take(frame.id_slots, ncid, axis=0)    # [rows, C]
        cand_ok = jnp.take(frame.ok_slots, ncid, axis=0) & valid[:, None]
        cand_pos = jnp.take(pos_slots, ncid, axis=0)
        cand_vel = jnp.take(vel_slots, ncid, axis=0)
        rho_j = jnp.take(frame.rho_slots, ncid, axis=0)

        ok = cand_ok & (cand_id != ids_rows[:, None])       # VelPos:82
        ok = ok & (rho_j > EPSILON)                         # VelPos:91
        safe_rho = jnp.where(rho_j > EPSILON, rho_j, 1.0)
        diff = pos_rows[:, None, :] - cand_pos
        gwp = sph_math.grad_w_press(diff, p.h, h6)
        gwv = sph_math.grad_w_vis(diff, p.h, h6)
        press_j = sph_math.eos_pressure(rho_j, p.gas_constant, p.rest_density)
        press_coef = (press_rows[:, None] + press_j) / (2.0 * safe_rho)
        dfp = jnp.sum(jnp.where(ok[..., None], press_coef[..., None] * gwp,
                                0.0), 1)
        dvel = cand_vel - vel_rows[:, None, :]
        vis_coef = gwv / safe_rho
        dfv = jnp.sum(jnp.where(ok[..., None], vis_coef[..., None] * dvel,
                                0.0), 1)
        return (f_press + dfp, f_vis + dfv), None

    zero = jnp.zeros_like(pos_rows)
    (f_press, f_vis), _ = jax.lax.scan(body, (zero, zero), offs)

    i_ok = (rho_rows > EPSILON)[:, None]
    safe_rho_i = jnp.where(rho_rows > EPSILON, rho_rows, 1.0)[:, None]
    f_press = jnp.where(i_ok, f_press * (p.mass * p.mass / safe_rho_i),
                        f_press)
    f_vis = jnp.where(i_ok, f_vis * (p.viscosity * p.mass * p.mass
                                     / safe_rho_i), f_vis)
    return f_press + f_vis
