"""Frame stepper and rollout engine.

Reproduces the reference's per-frame pipeline (SphFluidSimulation.cs:96-108):

    bucket build → density → 5 × (force + semi-implicit Euler) → render prep

with its critical semantic quirk kept as the default ("faithful" mode): the
neighbor bucket and the density field are computed ONCE per frame from
pre-substep positions and reused across all five substeps
(SphFluidSimulation.cs:98-102), while each substep re-reads fresh
positions/velocities. ``faithful=False`` switches to the physically-corrected
mode that rebuilds both every substep.

The texture ping-pong of the reference (SphFluidSimulation.cs:267-268,
290-293) disappears: the stepper is a pure function ``state → state`` and
rollouts ride ``jax.lax.scan``. Physics scalars ride a :class:`PhysParams`
pytree (the analogue of the reference's shader uniforms) so one compiled
executable serves any parameter setting and `vmap` gives multi-scene sweeps.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..params import PhysParams
from ..ops import brute, cellops, sph_math
from ..ops.grid import build_bucket, overflow_count
from ..state import ParticleState, StepMetrics, make_state

StepFn = Callable[[ParticleState], tuple[ParticleState, StepMetrics]]
ParamStepFn = Callable[[ParticleState, PhysParams],
                       tuple[ParticleState, StepMetrics]]


def integrate_substep(pos: jax.Array, vel: jax.Array, f_fluid: jax.Array,
                      p: PhysParams, xsph_dv: jax.Array | None = None
                      ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Wall penalty + gravity + NaN guard + semi-implicit Euler + clamp.

    Transcribes VelPos.compute:107-157. ``xsph_dv`` (optional) is the XSPH
    advection-velocity correction, applied to the position update only.
    Returns (pos', vel', nan_mask).
    """
    f_wall = sph_math.wall_force(pos, vel, p.h, p.stiffness, p.damping, p.mass)
    gravity = jnp.stack([jnp.zeros_like(p.gravity_y), p.gravity_y,
                         jnp.zeros_like(p.gravity_y)], -1)
    a = gravity + (f_fluid + f_wall) / p.mass

    # NaN trap (VelPos.compute:143-147): zero the acceleration AND the
    # velocity of any particle whose acceleration went NaN.
    nan_mask = jnp.any(jnp.isnan(a), axis=-1)
    vel_new = jnp.where(nan_mask[..., None], 0.0, vel + a * p.dt)
    adv = vel_new if xsph_dv is None else vel_new + xsph_dv
    pos_new = jnp.clip(pos + p.dt * adv, 0.0, 1.0)  # VelPos.compute:153-154
    return pos_new, vel_new, nan_mask


def _metrics(state: ParticleState, rho: jax.Array, nan_events: jax.Array,
             overflow: jax.Array, p: PhysParams,
             exact_cert: jax.Array | None = None) -> StepMetrics:
    speed2 = jnp.sum(state.vel * state.vel, axis=-1)
    return StepMetrics(
        max_speed=jnp.sqrt(jnp.max(speed2)),
        mean_density=jnp.mean(rho),
        kinetic_energy=0.5 * p.mass * jnp.sum(speed2),
        nan_events=nan_events,
        overflow=overflow,
        exact_cert=(jnp.int32(0) if exact_cert is None
                    else exact_cert.astype(jnp.int32)),
    )


def _brute_pair_mask(pos, bucket, r: int):
    """[N, N] candidate mask for the all-pairs extension oracles (same
    window semantics as the force pass: fresh cell center, stale bucket)."""
    cell_i = sph_math.cell_index(pos, r)
    return brute._window_mask(cell_i, bucket.cell_id, bucket.in_table, r)




def make_param_step(cfg: SimConfig, *, neighbor: str = "slotted",
                    faithful: bool = True,
                    pallas_tune=None) -> ParamStepFn:
    """Build the per-frame step ``(state, phys) → (state, metrics)``.

    ``cfg`` contributes only structure (shapes): particle count, bucket
    resolution, voxel capacity, substep count, neighbor backend. All physics
    scalars come from the traced ``phys`` pytree.

    neighbor: 'slotted' (slot-row gathers, fast), 'gather' (naive
              per-candidate gathers), or 'brute' (O(N²) oracle).
    faithful: reuse frame-start bucket + density across all substeps
              (reference semantics); False rebuilds per substep.
    """
    cfg = cfg.validate()
    if neighbor == "pallas":
        return _make_pallas_step(cfg, faithful=faithful, tune=pallas_tune)
    if neighbor == "sites":
        return _make_sites_step(cfg, faithful=faithful)
    if neighbor not in ("slotted", "gather", "brute"):
        raise ValueError(f"unknown neighbor backend {neighbor!r}")
    r = cfg.bucket_resolution
    n = cfg.n_particles
    cap = cfg.voxel_capacity
    if cap is None and neighbor != "brute":
        # The slotted/gather backends allocate static [n_cells, capacity]
        # slot arrays — an uncapped variant would need capacity == N. Loud
        # failure beats the silent 4x-mean substitute it used to be.
        raise ValueError(
            "voxel_capacity=None (no reference drop) is supported by the "
            "'brute' and 'pallas' backends only; pick a finite capacity "
            f"for neighbor={neighbor!r}")
    grid_capacity = cap
    ids = jnp.arange(n, dtype=jnp.int32)

    def frame_aux(pos, phys):
        """Bucket + density from current positions (frame start)."""
        if neighbor == "brute":
            bucket, _ = build_bucket(pos, r, cap)
            rho = brute.density_bruteforce(pos, bucket.cell_id,
                                           bucket.in_table, phys, r)
            return bucket, None, rho
        bucket, capacity = build_bucket(pos, r, grid_capacity)
        if neighbor == "slotted":
            slots = cellops.pack_slots(bucket.table, capacity, n, pos,
                                       None, None)
            rho = cellops.density_slotted_rows(pos, bucket.cell, slots,
                                               capacity, phys, r)
            frame = cellops.pack_slots(bucket.table, capacity, n, pos,
                                       jnp.zeros_like(pos), rho)
            return bucket, frame, rho
        rho = cellops.density_grid(pos, bucket, capacity, phys, r)
        return bucket, None, rho

    use_xsph = cfg.xsph != 0.0
    use_avisc = cfg.artificial_viscosity != 0.0
    if (use_xsph or use_avisc) and neighbor == "gather":
        raise NotImplementedError(
            "xsph/artificial viscosity are implemented for the 'slotted', "
            "'pallas' and 'brute' backends")

    def forces(pos, vel, rho, bucket, frame, phys):
        if neighbor == "brute":
            from ..ops import extensions
            pair_mask = (_brute_pair_mask(pos, bucket, r)
                         if (use_xsph or use_avisc) else None)
            f = brute.fluid_forces_bruteforce(pos, vel, rho, bucket.cell_id,
                                              bucket.in_table, phys, r)
            if use_avisc:
                f = f + extensions.artificial_viscosity_bruteforce(
                    pos, vel, rho, pair_mask, phys,
                    cfg.artificial_viscosity)
            dv = (extensions.xsph_bruteforce(pos, vel, rho, pair_mask, phys,
                                             cfg.xsph)
                  if use_xsph else None)
            return f, dv
        if neighbor == "slotted":
            from ..ops import extensions
            slots = cellops.repack_fresh(frame, bucket.table, grid_capacity,
                                         n, pos, vel)
            f = cellops.fluid_forces_slotted_rows(
                pos, vel, ids, rho, slots, grid_capacity, phys, r)
            if use_avisc:
                f = f + extensions.artificial_viscosity_slotted(
                    pos, vel, rho, slots, grid_capacity, phys, r,
                    cfg.artificial_viscosity)
            dv = (extensions.xsph_slotted(pos, vel, rho, slots,
                                          grid_capacity, phys, r, cfg.xsph)
                  if use_xsph else None)
            return f, dv
        return cellops.fluid_forces_grid(pos, vel, rho, bucket,
                                         grid_capacity, phys, r), None

    def substep(carry, _):
        pos, vel, nan_hits, bucket, frame, rho, phys = carry
        if not faithful:
            bucket, frame, rho = frame_aux(pos, phys)
        f_fluid, xsph_dv = forces(pos, vel, rho, bucket, frame, phys)
        pos, vel, nan_mask = integrate_substep(pos, vel, f_fluid, phys,
                                               xsph_dv)
        nan_hits = nan_hits + nan_mask.astype(jnp.int32)
        return (pos, vel, nan_hits, bucket, frame, rho, phys), None

    def step(state: ParticleState, phys: PhysParams
             ) -> tuple[ParticleState, StepMetrics]:
        pos, vel = state.pos, state.vel
        bucket, frame, rho = frame_aux(pos, phys)
        ovf = overflow_count(bucket)
        nan_hits = jnp.zeros(pos.shape[0], jnp.int32)
        # The five substeps ride lax.scan; in faithful mode bucket and rho
        # are loop-invariant carries, matching the reference's reuse of both
        # across substeps (SphFluidSimulation.cs:98-102).
        (pos, vel, nan_hits, _, _, _, _), _ = jax.lax.scan(
            substep, (pos, vel, nan_hits, bucket, frame, rho, phys), None,
            length=cfg.substeps)
        new_state = ParticleState(pos=pos, vel=vel,
                                  nan_count=state.nan_count + nan_hits)
        m = _metrics(new_state, rho, jnp.sum(nan_hits), ovf, phys)
        return new_state, m

    return step


def _make_sites_step(cfg: SimConfig, *, faithful: bool = True) -> ParamStepFn:
    """Frame step on the site-grid backend (the round-2 throughput tier).

    Pipeline per frame (ops/sites.py): frame binding (stale bucket
    membership) → site-grid density (once) → 5 × (site-grid forces +
    integrate), all per-particle state staying in particle order — the
    grids are rebuilt per substep from fresh values, which is exactly the
    reference's fresh-reads-through-stale-lists semantics
    (VelPos.compute:57-58, 86-94). ``faithful=False`` rebuilds binding and
    density every substep. StepMetrics.exact_cert counts candidates/sites
    dropped by the site capacity (SimConfig.site_capacity).
    """
    from ..ops import sites

    r = cfg.bucket_resolution
    cap = cfg.voxel_capacity  # None → truly uncapped bucket membership
    kj = cfg.site_capacity
    ki = cfg.site_capacity_i or kj
    xsph, alpha = cfg.xsph, cfg.artificial_viscosity
    # z-banded grids at flagship scale (the one-piece R³ grid overflows
    # worker memory at R≥~60; bit-identical — see sites._banded_pass)
    nb = cfg.site_bands or sites.auto_bands(r)

    def frame_aux(pos, phys):
        stale_cid, in_cap, ovf = sites.frame_binding(pos, r, cap)
        rho, cert = sites.density_sites(pos, stale_cid, in_cap, phys, r,
                                        ki, kj, z_bands=nb)
        return stale_cid, in_cap, ovf, rho, cert

    def step(state: ParticleState, phys: PhysParams
             ) -> tuple[ParticleState, StepMetrics]:
        pos, vel = state.pos, state.vel
        stale_cid, in_cap, ovf, rho0, cert0 = frame_aux(pos, phys)

        def substep(carry, _):
            pos, vel, nan_hits, cert, stale_cid, in_cap, rho = carry
            if not faithful:
                stale_cid, in_cap, _, rho, cd = frame_aux(pos, phys)
                cert = cert + cd
            f, dv, c = sites.fluid_forces_sites(
                pos, vel, rho, stale_cid, in_cap, phys, r, ki, kj,
                xsph=xsph, alpha_visc=alpha, z_bands=nb)
            pos, vel, nan_mask = integrate_substep(pos, vel, f, phys, dv)
            return (pos, vel, nan_hits + nan_mask.astype(jnp.int32),
                    cert + c, stale_cid, in_cap, rho), None

        nan0 = jnp.zeros(pos.shape[0], jnp.int32)
        (pos, vel, nan_hits, cert, _, _, _), _ = jax.lax.scan(
            substep, (pos, vel, nan0, cert0, stale_cid, in_cap, rho0),
            None, length=cfg.substeps)
        new_state = ParticleState(pos=pos, vel=vel,
                                  nan_count=state.nan_count + nan_hits)
        m = _metrics(new_state, rho0, jnp.sum(nan_hits), ovf, phys,
                     exact_cert=cert)
        return new_state, m

    return step


def _make_pallas_step(cfg: SimConfig, *, faithful: bool = True,
                      tune=None) -> ParamStepFn:
    """Frame step on the fused Pallas kernels (the throughput tier).

    Pipeline per frame: sort by stale cell (the deterministic bucket build)
    → permute state into sorted order → Pallas density (once) → 5 × (Pallas
    forces + wall/gravity/integrate, all in sorted space) → un-permute.
    Orderings and semantics match the reference pipeline exactly
    (SphFluidSimulation.cs:96-108); the kernels carry exactness
    certificates (drift/clip counters) surfaced as StepMetrics.exact_cert
    — see ops/pallas_sph.py.
    """
    from ..ops import pallas_sph

    r = cfg.bucket_resolution
    n = cfg.n_particles
    cap = cfg.voxel_capacity  # None -> no capacity drop (exactly uncapped)
    xsph, alpha = cfg.xsph, cfg.artificial_viscosity
    tune = tune or pallas_sph.default_tuning()

    if not faithful:
        # Physically-corrected mode: rebuild the sorted frame and the
        # density field every substep (the analogue of make_param_step's
        # ``faithful=False`` branch). State stays in caller order between
        # substeps; each substep sorts, computes, and unsorts.
        def step(state: ParticleState, phys: PhysParams
                 ) -> tuple[ParticleState, StepMetrics]:
            def substep(carry, _):
                pos, vel, nan_hits, cert = carry
                frame, (pos_s, vel_s) = pallas_sph.build_frame(
                    pos, r, cap, extras=(pos, vel), tune=tune)
                rho_s, dc = pallas_sph.density_pass(frame, pos_s, phys, r,
                                                    n, tune)
                f, dv, d = pallas_sph.forces_pallas(
                    frame, pos_s, vel_s, rho_s, phys, r, n, xsph=xsph,
                    alpha_visc=alpha, tune=tune)
                pos_s, vel_s, nan_mask = integrate_substep(pos_s, vel_s, f,
                                                           phys, dv)
                pos = jnp.zeros_like(pos_s).at[frame.order].set(pos_s)
                vel = jnp.zeros_like(vel_s).at[frame.order].set(vel_s)
                nan_u = (jnp.zeros(n, jnp.int32).at[frame.order]
                         .set(nan_mask.astype(jnp.int32)))
                return (pos, vel, nan_hits + nan_u,
                        cert + d + dc + frame.clip_count), None

            # frame-start aux for the overflow/density metrics (the
            # corrected branch of make_param_step reports these from the
            # pre-substep state too)
            frame0, (pos0_s,) = pallas_sph.build_frame(
                state.pos, r, cap, extras=(state.pos,), tune=tune)
            # metric-only density: its truncation cert (if any) recurs in
            # substep 1's own density_pass and is counted there
            rho0_s, _ = pallas_sph.density_pass(frame0, pos0_s, phys, r, n,
                                                tune)
            ovf = jnp.sum(~frame0.occ).astype(jnp.int32)
            rho_metric = (jnp.zeros(n, jnp.float32).at[frame0.order]
                          .set(rho0_s))

            nan0 = jnp.zeros(n, jnp.int32)
            (pos, vel, nan_hits, cert), _ = jax.lax.scan(
                substep, (state.pos, state.vel, nan0, jnp.int32(0)), None,
                length=cfg.substeps)
            new_state = ParticleState(pos=pos, vel=vel,
                                      nan_count=state.nan_count + nan_hits)
            return new_state, _metrics(new_state, rho_metric,
                                       jnp.sum(nan_hits), ovf, phys,
                                       exact_cert=cert)

        return step

    def step(state: ParticleState, phys: PhysParams
             ) -> tuple[ParticleState, StepMetrics]:
        # pos/vel ride the sort as operands (gather-free permutation)
        frame, (pos_s, vel_s) = pallas_sph.build_frame(
            state.pos, r, cap, extras=(state.pos, state.vel), tune=tune)
        rho_s, dcert = pallas_sph.density_pass(frame, pos_s, phys, r, n,
                                               tune)

        if tune.fused:
            # single-dispatch substeps over the rows-layout state
            rows = pallas_sph.pack_rows(pos_s, vel_s, rho_s, None, n, tune)

            def substep_f(carry, _):
                rows, cert = carry
                rows, c = pallas_sph.fused_substep(
                    frame, rows, phys, r, n, xsph=xsph, alpha_visc=alpha,
                    tune=tune)
                return (rows, cert + c), None

            (rows, drift), _ = jax.lax.scan(
                substep_f, (rows, jnp.int32(0)), None, length=cfg.substeps)
            pos_s, vel_s, _, nan_hits = pallas_sph.unpack_rows(rows, n)
        else:
            def substep(carry, _):
                pos_s, vel_s, nan_hits, drift = carry
                f_fluid, xsph_dv, d = pallas_sph.forces_pallas(
                    frame, pos_s, vel_s, rho_s, phys, r, n, xsph=xsph,
                    alpha_visc=alpha, tune=tune)
                pos_s, vel_s, nan_mask = integrate_substep(
                    pos_s, vel_s, f_fluid, phys, xsph_dv)
                return (pos_s, vel_s,
                        nan_hits + nan_mask.astype(jnp.int32),
                        drift + d), None

            nan0 = jnp.zeros(n, jnp.int32)
            (pos_s, vel_s, nan_hits, drift), _ = jax.lax.scan(
                substep, (pos_s, vel_s, nan0, jnp.int32(0)), None,
                length=cfg.substeps)

        # un-permute back to the caller's particle order
        pos = jnp.zeros_like(pos_s).at[frame.order].set(pos_s)
        vel = jnp.zeros_like(vel_s).at[frame.order].set(vel_s)
        nan_unsorted = jnp.zeros_like(nan_hits).at[frame.order].set(nan_hits)

        new_state = ParticleState(pos=pos, vel=vel,
                                  nan_count=state.nan_count + nan_unsorted)
        # matches grid.overflow_count: rank-overflow + out-of-range drops
        ovf = jnp.sum(~frame.occ).astype(jnp.int32)
        rho_metric = jnp.zeros(n, jnp.float32).at[frame.order].set(rho_s)
        # any nonzero drift/clip marks the frame as not-bitwise-exact
        m = _metrics(new_state, rho_metric, jnp.sum(nan_hits), ovf, phys,
                     exact_cert=drift + dcert + frame.clip_count)
        return new_state, m

    return step


def make_frame_step(cfg: SimConfig, *, neighbor: str = "slotted",
                    faithful: bool = True, pallas_tune=None) -> StepFn:
    """Single-scene step with the config's own physics baked as constants."""
    param_step = make_param_step(cfg, neighbor=neighbor, faithful=faithful,
                                 pallas_tune=pallas_tune)
    phys = PhysParams.from_config(cfg)
    return lambda state: param_step(state, phys)


def _make_pallas_rollout(cfg: SimConfig, n_frames: int,
                         snapshot_every: int = 0, tune=None,
                         scan_unroll: bool = False):
    """Pallas rollout that keeps state in SORTED order across frames.

    The per-frame un-permute of the generic path costs three XLA scatters
    (~14 ms/frame at 262k — TPU scatter runs ~80× off HBM peak); since the
    next frame's build re-sorts anyway, the rollout instead carries sorted
    state plus a particle-id column through the frame scan and un-permutes
    ONCE at the end (and at snapshot boundaries). Semantics are identical:
    sorting is keyed on values, not order.
    """
    from ..ops import pallas_sph

    r = cfg.bucket_resolution
    n = cfg.n_particles
    cap = cfg.voxel_capacity
    xsph, alpha = cfg.xsph, cfg.artificial_viscosity
    phys = PhysParams.from_config(cfg)
    tune = tune or pallas_sph.default_tuning()

    def frame_sorted(pos, vel, nan_count, pid):
        # pid doubles as the sort's tie-break (gid): capacity ranks stay
        # keyed to ORIGINAL particle ids, so the rollout is bit-identical
        # to per-frame stepping; frame.order is then the sorted pid column
        frame, (pos_s, vel_s, nan_s) = pallas_sph.build_frame(
            pos, r, cap, extras=(pos, vel, nan_count), gid=pid, tune=tune)
        pid_s = frame.order
        rho_s, dcert = pallas_sph.density_pass(frame, pos_s, phys, r, n,
                                               tune)

        if tune.fused:
            rows = pallas_sph.pack_rows(pos_s, vel_s, rho_s, None, n, tune)

            def substep_f(carry, _):
                rows, cert = carry
                rows, c = pallas_sph.fused_substep(
                    frame, rows, phys, r, n, xsph=xsph, alpha_visc=alpha,
                    tune=tune)
                return (rows, cert + c), None

            # Unrolling the 5-substep scan lets XLA fuse/overlap the
            # between-kernel glue across substeps: +1.5-2% measured at
            # 262k and 1M, bit-identical COMPILED (same certs/overflow on
            # the TPU A/B). Off by default: in CPU-interpret mode the
            # cross-substep re-fusion shifts a handful of elements by
            # 1 ulp, which would break the rollout == per-frame-stepping
            # bitwise contract (test_sorted_rollout_matches_per_frame_
            # stepping); bench.py opts in explicitly.
            (rows, cert), _ = jax.lax.scan(
                substep_f, (rows, jnp.int32(0)), None,
                length=cfg.substeps,
                unroll=cfg.substeps if scan_unroll else 1)
            pos_s, vel_s, _, nan_hits = pallas_sph.unpack_rows(rows, n)
        else:
            def substep(carry, _):
                pos_s, vel_s, nan_hits, cert = carry
                f, dv, c = pallas_sph.forces_pallas(
                    frame, pos_s, vel_s, rho_s, phys, r, n, xsph=xsph,
                    alpha_visc=alpha, tune=tune)
                pos_s, vel_s, nan_mask = integrate_substep(pos_s, vel_s, f,
                                                           phys, dv)
                return (pos_s, vel_s,
                        nan_hits + nan_mask.astype(jnp.int32),
                        cert + c), None

            nan0 = jnp.zeros(n, jnp.int32)
            (pos_s, vel_s, nan_hits, cert), _ = jax.lax.scan(
                substep, (pos_s, vel_s, nan0, jnp.int32(0)), None,
                length=cfg.substeps)
        ovf = jnp.sum(~frame.occ).astype(jnp.int32)
        st = ParticleState(pos=pos_s, vel=vel_s,
                           nan_count=nan_s + nan_hits)
        m = _metrics(st, rho_s, jnp.sum(nan_hits), ovf, phys,
                     exact_cert=cert + dcert + frame.clip_count)
        return pos_s, vel_s, st.nan_count, pid_s, m

    def unsort(pid, *arrs):
        return tuple(
            jnp.zeros_like(a).at[pid].set(a) for a in arrs)

    def body(carry, _):
        pos, vel, nan_count, pid = carry
        pos, vel, nan_count, pid, m = frame_sorted(pos, vel, nan_count, pid)
        return (pos, vel, nan_count, pid), m

    def chunk_body(carry, _):
        carry, m = jax.lax.scan(body, carry, None, length=snapshot_every)
        (snap,) = unsort(carry[3], carry[0])
        return carry, (m, snap)

    @jax.jit
    def rollout(state: ParticleState):
        pid0 = jnp.arange(n, dtype=jnp.int32)
        carry = (state.pos, state.vel, state.nan_count, pid0)
        if snapshot_every > 1:
            carry, (m, snaps) = jax.lax.scan(
                chunk_body, carry, None,
                length=n_frames // snapshot_every)
            m = jax.tree.map(
                lambda x: x.reshape((n_frames,) + x.shape[2:]), m)
        else:
            carry, outs = jax.lax.scan(body, carry, None, length=n_frames)
            m = outs
        pos, vel, nan_count = unsort(carry[3], carry[0], carry[1],
                                     carry[2])
        final = ParticleState(pos=pos, vel=vel, nan_count=nan_count)
        if snapshot_every > 1:
            return final, m, snaps
        return final, m

    return rollout


def make_dt_rollout(cfg: SimConfig, n_frames: int, *,
                    neighbor: str = "slotted", faithful: bool = True,
                    snapshot_every: int = 0, pallas_tune=None):
    """Variable frame-dt rollout: ``(state, dt_schedule) → (state, metrics)``.

    The reference's timestep is frame-rate-dependent — each substep advances
    ``Time.deltaTime / 25`` (SphFluidSimulation.cs:101-102) — so a faithful
    replay of a recorded session needs a PER-FRAME dt sequence, not the fixed
    ``frame_dt`` that `make_rollout` bakes for determinism (config.py:76-81).
    ``dt_schedule`` is ``f32[n_frames]`` of FRAME deltas (Unity's
    ``Time.deltaTime``); each frame's substep dt is
    ``dt_schedule[f] / substep_divisor``. All other physics ride the config.

    Bit-equal to stepping frame-by-frame through ``make_param_step`` with
    ``phys._replace(dt=dt_f / divisor)`` per call (pinned in
    tests/test_rollout.py).
    """
    if snapshot_every < 0 or (snapshot_every and n_frames % snapshot_every):
        raise ValueError("snapshot_every must be 0 or divide n_frames")
    cfg = cfg.validate()
    param_step = make_param_step(cfg, neighbor=neighbor, faithful=faithful,
                                 pallas_tune=pallas_tune)
    base = PhysParams.from_config(cfg)
    div = jnp.float32(cfg.substep_divisor)

    def body(state, dt):
        st, m = param_step(state, base._replace(dt=dt / div))
        out = (m, st.pos) if snapshot_every == 1 else (m,)
        return st, out

    def chunk_body(state, dts):
        state, (m,) = jax.lax.scan(body, state, dts)
        return state, (m, state.pos)

    @jax.jit
    def rollout(state: ParticleState, dt_schedule: jax.Array):
        dts = jnp.asarray(dt_schedule, jnp.float32).reshape(n_frames)
        if snapshot_every > 1:
            final, (m, snaps) = jax.lax.scan(
                chunk_body, state,
                dts.reshape(n_frames // snapshot_every, snapshot_every))
            m = jax.tree.map(lambda x: x.reshape((n_frames,) + x.shape[2:]),
                             m)
            return final, m, snaps
        final, outs = jax.lax.scan(body, state, dts)
        return (final,) + tuple(outs)

    return rollout


def make_rollout(cfg: SimConfig, n_frames: int, *, neighbor: str = "slotted",
                 faithful: bool = True, snapshot_every: int = 0,
                 pallas_tune=None, scan_unroll: bool = False):
    """Build a jitted ``state → (state, metrics[, snapshots])`` rollout over
    ``n_frames`` frames via lax.scan (one device dispatch per rollout).

    ``snapshot_every=k`` (k > 0) additionally returns the position array of
    every k-th frame (frames k-1, 2k-1, ... in 0-based frame order), stacked
    as ``f32[n_frames // k, N, 3]``; 0 disables snapshots.

    ``scan_unroll`` unrolls the pallas rollout's per-frame substep scan
    (+1.5-2% measured, compiled-bit-identical; CPU-interpret re-fusion can
    shift 1 ulp, so it is opt-in — bench.py enables it).

    For the reference's frame-rate-dependent timestep (a recorded
    ``Time.deltaTime`` trace), see :func:`make_dt_rollout`.
    """
    if snapshot_every < 0 or (snapshot_every and n_frames % snapshot_every):
        raise ValueError("snapshot_every must be 0 or divide n_frames")
    if neighbor == "sites" and n_frames > 1:
        # A frames-lax.scan over the BANDED sites step reproducibly faults
        # the tunneled TPU worker at flagship scale (1M, R=75): every
        # banded dispatch passes in isolation and a host-chained rollout
        # of the same jitted step runs fine — only the scan COMPOSITION
        # dies (BENCH_NOTES round 3 "z-banded site grids"; bisect in
        # scripts/probe_banded_tpu.py). Fail loud with the working
        # alternative instead of killing the worker for ~40 min.
        from ..ops import sites as _sites
        bands = cfg.site_bands or _sites.auto_bands(cfg.bucket_resolution)
        if bands > 1 and os.environ.get("SPH_SITES_SCAN_OK", "0") != "1":
            raise ValueError(
                f"multi-frame lax.scan rollouts of the banded sites step "
                f"(bucket_resolution={cfg.bucket_resolution} -> {bands} "
                f"z-bands) fault the TPU worker; chain single-frame "
                f"dispatches instead (bench.run_bench(neighbor='sites', "
                f"host_loop=True) or a host loop over make_frame_step). "
                f"Set SPH_SITES_SCAN_OK=1 to override off-TPU.")
    if neighbor == "pallas" and faithful and snapshot_every != 1:
        return _make_pallas_rollout(cfg.validate(), n_frames,
                                    snapshot_every, tune=pallas_tune,
                                    scan_unroll=scan_unroll)
    step = make_frame_step(cfg, neighbor=neighbor, faithful=faithful,
                           pallas_tune=pallas_tune)

    def body(state, _):
        new_state, m = step(state)
        out = (m, new_state.pos) if snapshot_every == 1 else (m,)
        return new_state, out

    def chunk_body(state, _):
        # inner scan of k frames; only the chunk-final positions are kept,
        # so device memory holds n_frames // k snapshots, not n_frames
        state, (m,) = jax.lax.scan(body, state, None, length=snapshot_every)
        return state, (m, state.pos)

    @jax.jit
    def rollout(state: ParticleState):
        if snapshot_every > 1:
            final, (m, snaps) = jax.lax.scan(
                chunk_body, state, None, length=n_frames // snapshot_every)
            m = jax.tree.map(lambda x: x.reshape((n_frames,) + x.shape[2:]), m)
            return final, m, snaps
        final, outs = jax.lax.scan(body, state, None, length=n_frames)
        return (final,) + tuple(outs)

    return rollout


def initial_state(cfg: SimConfig) -> ParticleState:
    """Spawn per the config preset with zero velocities
    (SphFluidSimulation.cs:157-190)."""
    from ..models.presets import init_positions
    return make_state(init_positions(cfg))
