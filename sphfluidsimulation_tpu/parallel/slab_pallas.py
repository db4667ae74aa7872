"""Slab decomposition composed with the Pallas throughput tier.

Round 2 left "fast" and "multi-chip" as disjoint capabilities: the slab
decomposition (parallel/slab.py) exchanged dense site-grid z-planes — a
formulation only the ~10×-slower sites backend has — while the Pallas
kernels ran single-chip only. This module closes that hole the way the
round-2 verdict specified: per-device CELL-SORTED COMPACT arrays over the
owned z-slab, halo exchange of boundary *particle rows* (packed field
rows, not dense grids) via ``lax.ppermute``, and the migration ring reused
from slab.py.

Decomposition invariants
------------------------

* Ownership is keyed by the STALE anchor cell's z-plane — the same
  once-per-frame binding quirk (SphFluidSimulation.cs:98-102) that makes
  sites-slab ownership frame-stable makes the halo ROW SETS frame-stable
  here: the rows a device must see from its neighbors are exactly the
  neighbors' rows whose stale z lies within ``halo`` planes of the
  boundary, fixed for all 5 substeps.
* Per frame: one migration ring + one boundary-row exchange (pos, vel,
  pid) + one boundary-rho exchange after the density pass.
* Per substep: ONE ppermute hop per direction shipping the fresh
  (pos, vel) of the same fixed boundary rows ([halo_cap, 6] f32 — riding
  ICI), scattered into the local sorted rows state at frame-constant
  positions; then one fused Pallas substep dispatch on the local arrays.
* Per-device memory is O(N/D + halo) by shape: rows ``[C + 2·halo_cap,…]``
  and cell tables ``[(slab_z + 2·halo)·R² + 1]`` — no array of global
  size N or R³ appears inside the sharded step (the banded
  ``build_frame``, ops/pallas_sph.py).

Exactness: own rows' candidate windows (stale e=2 envelope,
VelPos.compute:67-81) lie inside the halo'd band whenever ``halo >= 2``;
fresh drift beyond 1 z-plane, halo-capacity overflow, migration loss and
window truncation are all counted into the exactness certificate — the
same loud-not-wrong contract as the single-device tier. Halo rows are
integrated locally with incomplete windows, but every one of their values
is overwritten by the owner's authoritative update at the next exchange,
so no wrong value is ever read.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SimConfig
from ..params import PhysParams
from ..ops import pallas_sph as ps
from ..state import StepMetrics
from .slab import SlabSpec, SlabState, _migrate


class PallasSlabSpec(NamedTuple):
    d: int         # devices along the slab axis
    slab_z: int    # owned z-planes per device (= ceil(R / D))
    halo: int      # boundary planes per side (>= 2: force window envelope)
    cap_rows: int  # per-device particle row capacity C
    halo_cap: int  # boundary-row buffer capacity per side
    hops: int      # migration ring hops per direction
    z_span: int    # local band planes = slab_z + 2·halo

    @property
    def c_loc(self) -> int:
        return self.cap_rows + 2 * self.halo_cap


def make_pallas_spec(cfg: SimConfig, n_dev: int, *, halo: int = 2,
                     row_slack: float = 2.0, halo_slack: float = 4.0,
                     hops: int | None = None) -> PallasSlabSpec:
    r = cfg.bucket_resolution
    slab_z = -(-r // n_dev)
    halo = min(halo, slab_z)
    if halo < 1:
        raise ValueError("halo must be >= 1")
    cap = -(-int(cfg.n_particles * row_slack) // n_dev)
    cap = ((cap + 127) // 128) * 128
    occ = cfg.n_particles / float(r ** 3)
    hcap = int(halo * r * r * occ * halo_slack) + 128
    hcap = min(((hcap + 127) // 128) * 128, cap)
    return PallasSlabSpec(d=n_dev, slab_z=slab_z, halo=halo, cap_rows=cap,
                          halo_cap=hcap,
                          hops=n_dev - 1 if hops is None else hops,
                          z_span=slab_z + 2 * halo)


def _gather_compact(mask: jax.Array, cap: int, *cols: jax.Array):
    """Front-compact the rows where ``mask`` holds into [cap]-buffers.

    Returns (bufs…, idx, valid, dropped): ``idx`` are the source row
    indices (arbitrary rows for slots past the mask population — callers
    carry ``valid`` alongside), ``dropped`` counts mask rows beyond cap.
    """
    c = mask.shape[0]
    iota = lax.iota(jnp.int32, c)
    _, order = lax.sort(((~mask).astype(jnp.int32), iota), num_keys=1,
                        is_stable=True)
    idx = order[:cap]
    valid = mask[idx]
    n_mask = jnp.sum(mask.astype(jnp.int32))
    dropped = jnp.maximum(n_mask - cap, 0)
    return tuple(c0[idx] for c0 in cols) + (idx, valid, dropped)


def _make_local_step(cfg: SimConfig, spec: PallasSlabSpec, axis: str,
                     tune: ps.PallasTuning):
    r = cfg.bucket_resolution
    cap = cfg.voxel_capacity
    xsph, alpha = cfg.xsph, cfg.artificial_viscosity
    occ_hint = cfg.n_particles / float(r ** 3)
    c0, hc = spec.cap_rows, spec.halo_cap
    c_loc = spec.c_loc
    band_span = spec.z_span
    up = [(i, i + 1) for i in range(spec.d - 1)]
    down = [(i, i - 1) for i in range(1, spec.d)]

    def pperm(x, perm):
        if spec.d == 1:
            return jnp.zeros_like(x)
        return lax.ppermute(x, axis, perm)

    def local_step(pos, vel, nan_count, pid, valid, phys):
        my = lax.axis_index(axis)
        zbase = my * spec.slab_z - spec.halo
        band = (zbase, band_span)

        # -- frame boundary: deliver every particle to its owner slab
        frows = jnp.concatenate([pos, vel], 1)
        irows = jnp.stack([nan_count, pid], 1)
        mig_spec = SlabSpec(d=spec.d, slab_z=spec.slab_z, halo=spec.halo,
                            cap_rows=spec.cap_rows, hops=spec.hops)
        frows, irows, valid, lost = _migrate(frows, irows, valid, my, r,
                                             mig_spec, axis)
        pos, vel = frows[:, 0:3], frows[:, 3:6]
        nan_count, pid = irows[:, 0], irows[:, 1]

        # -- boundary-row exchange (frame-stable sets, keyed by stale z)
        az = jnp.clip((pos[:, 2] * (r - 1)).astype(jnp.int32), 0, r - 1)
        own_lo = my * spec.slab_z
        bnd_dn = valid & (az < own_lo + spec.halo)
        bnd_up = valid & (az >= own_lo + spec.slab_z - spec.halo)
        (dn_f, dn_pid, dn_nan, dn_idx, dn_valid, dn_drop) = _gather_compact(
            bnd_dn, hc, jnp.concatenate([pos, vel], 1), pid, nan_count)
        (up_f, up_pid, up_nan, up_idx, up_valid, up_drop) = _gather_compact(
            bnd_up, hc, jnp.concatenate([pos, vel], 1), pid, nan_count)
        # my bottom halo = the slab below's TOP boundary rows (sent up);
        # my top halo = the slab above's BOTTOM boundary rows (sent down)
        hb_f = pperm(up_f, up)
        hb_pid = pperm(up_pid, up)
        hb_valid = pperm(up_valid.astype(jnp.int32), up) > 0
        ht_f = pperm(dn_f, down)
        ht_pid = pperm(dn_pid, down)
        ht_valid = pperm(dn_valid.astype(jnp.int32), down) > 0

        pos_l = jnp.concatenate([pos, hb_f[:, 0:3], ht_f[:, 0:3]], 0)
        vel_l = jnp.concatenate([vel, hb_f[:, 3:6], ht_f[:, 3:6]], 0)
        pid_l = jnp.concatenate([pid, hb_pid, ht_pid], 0)
        nan_l = jnp.concatenate([nan_count, jnp.zeros(2 * hc, jnp.int32)], 0)
        valid_l = jnp.concatenate([valid, hb_valid, ht_valid], 0)
        lidx = lax.iota(jnp.int32, c_loc)

        # -- banded sorted frame; gid=pid keeps the reference's 32-slot
        # capacity drop (Bucket.compute:30-35) device-count invariant:
        # owner and halo copies rank a shared cell's rows identically
        frame, (pos_s, vel_s, nan_s, lidx_s) = ps.build_frame(
            pos_l, r, cap, extras=(pos_l, vel_l, nan_l, lidx), gid=pid_l,
            tune=tune, band=band, valid=valid_l, occ_hint=occ_hint)
        inv = jnp.zeros(c_loc, jnp.int32).at[lidx_s].set(lidx)

        # -- stale density (once per frame, SphFluidSimulation.cs:98-100);
        # halo rows' local estimate is edge-truncated, so overwrite it
        # with the owner's value (one rho exchange)
        rho_s, dcert = ps.density_pass(frame, pos_s, phys, r, c_loc, tune,
                                       occ_hint, band=band)
        rho_l = jnp.zeros(c_loc, jnp.float32).at[lidx_s].set(rho_s)
        hb_rho = pperm(rho_l[up_idx], up)
        ht_rho = pperm(rho_l[dn_idx], down)
        rho_l = rho_l.at[c0:c0 + hc].set(hb_rho) \
                     .at[c0 + hc:].set(ht_rho)
        rho_s = rho_l[lidx_s]

        rows = ps.pack_rows(pos_s, vel_s, rho_s,
                            nan_s.astype(jnp.float32), c_loc, tune)
        npad = ps.padded_n(c_loc, tune)

        # frame-constant sorted positions of the exchanged rows
        dn_spos = inv[dn_idx]
        up_spos = inv[up_idx]
        hb_spos = inv[c0 + lax.iota(jnp.int32, hc)]
        ht_spos = inv[c0 + hc + lax.iota(jnp.int32, hc)]

        def exchange_fresh(rows):
            flat = rows.reshape(npad, ps.N_FIELDS)
            hb_new = pperm(flat[up_spos, 0:6], up)
            ht_new = pperm(flat[dn_spos, 0:6], down)
            flat = flat.at[hb_spos, 0:6].set(hb_new)
            flat = flat.at[ht_spos, 0:6].set(ht_new)
            return flat.reshape(rows.shape)

        def substep(carry, _):
            rows, cert = carry
            rows, c = ps.fused_substep(frame, rows, phys, r, c_loc,
                                       xsph=xsph, alpha_visc=alpha,
                                       tune=tune, band=band,
                                       occ_hint=occ_hint)
            # authoritative fresh values for the halo copies (next substep
            # reads them through the frame-stale candidate structure)
            rows = exchange_fresh(rows)
            return (rows, cert + c), None

        cert0 = (frame.clip_count + dcert + lost + dn_drop + up_drop)
        (rows, cert), _ = lax.scan(substep, (rows, cert0), None,
                                   length=cfg.substeps)

        # -- frame end: sorted rows -> local row order; keep own rows only
        flat = rows.reshape(npad, ps.N_FIELDS)[:c_loc]
        pos_n = jnp.zeros((c_loc, 3), jnp.float32).at[lidx_s].set(
            flat[:, 0:3])[:c0]
        vel_n = jnp.zeros((c_loc, 3), jnp.float32).at[lidx_s].set(
            flat[:, 3:6])[:c0]
        nan_n = jnp.zeros(c_loc, jnp.float32).at[lidx_s].set(
            flat[:, 7])[:c0].astype(jnp.int32)
        pos_n = jnp.where(valid[:, None], pos_n, pos)
        vel_n = jnp.where(valid[:, None], vel_n, vel)
        nan_hits = jnp.where(valid, nan_n - nan_count, 0)

        # -- metrics over own valid rows (replicated scalars)
        occ_l = jnp.zeros(c_loc, jnp.bool_).at[lidx_s].set(frame.occ)
        ovf = jnp.sum((valid & ~occ_l[:c0]).astype(jnp.int32))
        vmask = valid.astype(jnp.float32)
        speed2 = jnp.sum(vel_n * vel_n, -1) * vmask
        n_valid = lax.psum(jnp.sum(vmask), axis)
        m = StepMetrics(
            max_speed=jnp.sqrt(lax.pmax(jnp.max(speed2), axis)),
            mean_density=lax.psum(jnp.sum(rho_l[:c0] * vmask), axis)
            / jnp.maximum(n_valid, 1.0),
            kinetic_energy=0.5 * phys.mass * lax.psum(jnp.sum(speed2),
                                                      axis),
            nan_events=lax.psum(jnp.sum(nan_hits), axis),
            overflow=lax.psum(ovf, axis),
            exact_cert=lax.psum(cert, axis))
        return pos_n, vel_n, nan_count + nan_hits, pid, valid, m

    return local_step


def make_pallas_slab_step(cfg: SimConfig, mesh: Mesh, *, axis: str = "sp",
                          halo: int = 2, row_slack: float = 2.0,
                          halo_slack: float = 4.0, hops: int | None = None,
                          tune: ps.PallasTuning | None = None):
    """Sharded faithful frame step on the Pallas tier:
    ``(SlabState, phys) → (SlabState, metrics)``.

    SlabState leaves are sharded ``P(axis)`` on the leading D·C dim (reuse
    slab.distribute/slab.collect with the returned spec). Wrap in jax.jit.
    """
    cfg = cfg.validate()
    tune = tune or ps.default_tuning()
    if not tune.fused:
        tune = tune._replace(fused=True)
    spec = make_pallas_spec(cfg, mesh.shape[axis], halo=halo,
                            row_slack=row_slack, halo_slack=halo_slack,
                            hops=hops)
    local = _make_local_step(cfg, spec, axis, tune)
    shmapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False)

    def step(st: SlabState, phys: PhysParams):
        pos, vel, nan_count, pid, valid, m = shmapped(
            st.pos, st.vel, st.nan_count, st.pid, st.valid, phys)
        return SlabState(pos, vel, nan_count, pid, valid), m

    return step, spec
