"""Dense slot-grid SPH backend — the round-2 throughput tier.

The reference walks, per particle, a 27-voxel window of a dense bucket table
(Density.compute:42-57, VelPos.compute:67-98). Gather-based formulations of
that walk are bandwidth-crippled on TPU (~10 GB/s effective for random
access). This backend removes *all* gathers from the hot path by storing the
particles themselves in a dense voxel-slot grid:

    field[k, c]   for slot k < K, flat cell c = x + y·R + z·R²   (k-major)

With cells flattened x-minor (the reference's own flat-id arithmetic,
Bucket.compute:28), the candidates of cell ``c`` at window offset
``(ox,oy,oz)`` live at ``field[:, c + ox + oy·R + oz·R²]`` — a *uniform
shift* of the whole array. The 27-cell gather becomes 27 shifted slices of a
padded array, and the pair interaction between every i-slot and every j-slot
of the shifted grid is one dense broadcast ``[K,1,S] × [1,K,S] → [K,K,S]``
that XLA fuses onto the VPU at full tile utilization. Measured on TPU v5e:
the shift+math pattern sustains ~2.4 Tops/s vs ~10 GB/s for gathers.

Exactness under the reference's stale-bucket semantics
------------------------------------------------------

The reference builds the bucket once per frame but re-centers each
particle's window on its *fresh* cell every substep (VelPos.compute:57-58),
so a drifting particle reads a window displaced by δ = fresh − stale cells.
Slots are frame-stale, so we scan a *wider* offset range around the stale
cell and gate every candidate cell by ``|off − δ_i| ≤ 1`` per axis — which
reproduces the reference's fresh-centered 27-cell candidate set exactly,
for any drift up to scan radius − 1. The radius escalates adaptively per
substep (lax.switch on the global max |δ|): radius 1 (27 offsets) when no
particle crossed a cell boundary, radius 2 (125) for one-cell drift, etc.
Particles drifting beyond the largest compiled radius are counted in the
exactness certificate (StepMetrics.exact_cert).

Empty slots and the padded margins encode position FAR=2.0 (the domain is
the unit cube): every SPH kernel vanishes identically at r ≥ h, so empties
contribute exactly zero without occupancy masks in the pair math. Slots
also carry 1/(2ρ) with the reference's ρ>ε guard folded in (VelPos:91), so
the guard costs nothing per pair.

Capacity semantics match the slotted backend: slot ranks are deterministic
(stable sort by cell id, ties by particle id) and particles beyond K per
voxel are dropped from the grid. Unlike the slotted backend the *i*-side
also lives in slots, so a capacity-dropped particle is frozen for the frame
(position/velocity carried through unchanged) — the reference, by contrast,
always integrates every particle and only drops it as a *neighbor*
(Bucket.compute:30-35). Both kinds of drop are surfaced loudly:
``overflow`` counts frozen particles, ``cert_j`` counts reference-kept
candidates we dropped (cells where min(occupancy, 32) > K). Choose
K ≥ the workload's max voxel occupancy (golden scene: measure) and both
are zero.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import EPSILON, REFERENCE_VOXEL_CAPACITY
from ..params import PhysParams

_PI = math.pi
FAR = 2.0  # empty-slot position: ≥ 1+h from any in-cube point ⇒ kernels ≡ 0


class DenseFrame(NamedTuple):
    """Per-frame dense slot grid (pytree). All slot arrays are [K, S] with
    S = R³ flat cells, x-minor (Bucket.compute:28). ``pos``/``vel`` hold
    FRESH values (updated in slot space every substep); ``rho``/``press``/
    ``irho2`` are the frame-start STALE fields the reference reuses across
    all five substeps (SphFluidSimulation.cs:98-102)."""

    pos: jax.Array       # f32[3, K, S]; empty slots FAR
    vel: jax.Array       # f32[3, K, S]; empty slots 0
    rho: jax.Array       # f32[K, S] stale density; empty 0
    press: jax.Array     # f32[K, S] stale EOS pressure
    irho2: jax.Array     # f32[K, S] = 1/(2ρ) with the ρ>ε guard folded in
    occ: jax.Array       # bool[K, S]
    slot_of: jax.Array   # i32[N] flat slot (k·S + c); sentinel K·S if dropped
    slotted: jax.Array   # bool[N]
    cert_j: jax.Array    # i32[] reference-kept candidates dropped (K too low)


def _cell_coords(r: int, s: int):
    """Static per-cell (x, y, z) coordinate arrays, i32[S]."""
    c = lax.iota(jnp.int32, s)
    return c % r, (c // r) % r, c // (r * r)


def build_dense_frame(pos: jax.Array, vel: jax.Array, r: int, k: int
                      ) -> DenseFrame:
    """Sort particles into the dense slot grid (the frame's bucket build).

    Deterministic stable sort by flat cell id, ties by particle id — the
    same rank rule as ops.grid.build_bucket, so candidate SETS match the
    slotted backend exactly. The reference's flat-id aliasing (out-of-range
    x wrapping into the next y row, Bucket.compute:28) is kept by keying on
    the flat id; fully out-of-range ids are dropped, matching the
    reference's discarded out-of-bounds UAV writes.
    """
    n = pos.shape[0]
    s = r * r * r
    cell = (pos * (r - 1)).astype(jnp.int32)           # trunc, HLSL int3 cast
    cid = cell[..., 0] + cell[..., 1] * r + cell[..., 2] * (r * r)
    iota = lax.iota(jnp.int32, n)
    sorted_cid, order = lax.sort((cid, iota), num_keys=1, is_stable=True)
    run_start = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = iota - run_start.astype(jnp.int32)
    in_range = (sorted_cid >= 0) & (sorted_cid < s)
    ok = in_range & (rank < k)
    slot_sorted = jnp.where(ok, rank * s + jnp.clip(sorted_cid, 0, s - 1),
                            k * s)
    slot_of = jnp.zeros(n, jnp.int32).at[order].set(slot_sorted)
    slotted = slot_of < k * s

    def to_slots(vals, fill):
        flat = jnp.full(k * s, fill, jnp.float32)
        return flat.at[slot_of].set(vals, mode="drop").reshape(k, s)

    pos_s = jnp.stack([to_slots(pos[:, a], FAR) for a in range(3)])
    vel_s = jnp.stack([to_slots(vel[:, a], 0.0) for a in range(3)])
    occ = (jnp.zeros(k * s, jnp.bool_).at[slot_of].set(True, mode="drop")
           .reshape(k, s))

    # Reference-parity drop audit: the reference keeps up to 32 candidates
    # per voxel (Bucket.compute:2); cells where min(occupancy, 32) > K lose
    # candidates the reference kept.
    counts = jnp.zeros(s, jnp.int32).at[jnp.clip(cid, 0, s - 1)].add(
        ((cid >= 0) & (cid < s)).astype(jnp.int32))
    cert_j = jnp.sum(jnp.maximum(
        jnp.minimum(counts, REFERENCE_VOXEL_CAPACITY) - k, 0)
    ).astype(jnp.int32)

    zero = jnp.zeros((k, s), jnp.float32)
    return DenseFrame(pos=pos_s, vel=vel_s, rho=zero, press=zero, irho2=zero,
                      occ=occ, slot_of=slot_of, slotted=slotted,
                      cert_j=cert_j)


def frame_delta(frame: DenseFrame, r: int):
    """Per-slot window displacement δ = fresh cell − slot cell (i32[3,K,S])
    and the global max per-axis |δ| (i32[]) driving window escalation.

    The fresh cell is recomputed from current positions exactly as the
    reference does each substep (VelPos.compute:57-58, int-cast truncation
    toward zero for jitter-spawned negatives).
    """
    k, s = frame.occ.shape
    coords = _cell_coords(r, s)
    deltas = []
    for a in range(3):
        fresh = (frame.pos[a] * (r - 1)).astype(jnp.int32)
        deltas.append(jnp.where(frame.occ, fresh - coords[a][None, :], 0))
    delta = jnp.stack(deltas)
    dmax = jnp.max(jnp.abs(delta)).astype(jnp.int32)
    return delta, dmax


def _pad(arr: jax.Array, pad: int, fill: float) -> jax.Array:
    return jnp.pad(arr, ((0, 0), (pad, pad)), constant_values=fill)


def _shift_windows(padded, r: int, s: int, w: int, oz, m: int):
    """Dynamic z-plane slice of padded fields for traced z-offset ``oz``.

    Each padded field is [K, pad+S+pad] with pad = w·(R²+R+1); the returned
    window [K, S+2m] (m = w·(R+1)) contains every (oy,ox) sub-slice of the
    oz plane as a *static* slice starting at m + oy·R + ox.
    """
    pad = w * (r * r + r + 1)
    start = pad + oz * (r * r) - m
    return [lax.dynamic_slice(f, (jnp.int32(0), start),
                              (f.shape[0], s + 2 * m)) for f in padded]


def _gate(r: int, s: int, oz, oy: int, ox: int, delta):
    """Candidate-cell gate at window offset (ox,oy,oz): reference bounds
    check (Density.compute:46) AND fresh-window membership |off − δ| ≤ 1
    per axis (VelPos.compute:57-58,67-69). f32[K, S]."""
    cx, cy, cz = _cell_coords(r, s)
    b = ((cx + ox >= 0) & (cx + ox < r) & (cy + oy >= 0) & (cy + oy < r)
         & (cz + oz >= 0) & (cz + oz < r))
    wm = ((jnp.abs(ox - delta[0]) <= 1) & (jnp.abs(oy - delta[1]) <= 1)
          & (jnp.abs(oz - delta[2]) <= 1))
    return (b[None, :] & wm).astype(jnp.float32)


def make_density_pass(r: int, s: int, k: int, w: int):
    """Density over the slot grid at scan radius ``w`` (Density.compute:32-60;
    the self term is included — no j==i skip). Returns f32[K, S]."""
    m = w * (r + 1)
    pad = w * (r * r + r + 1)

    def run(pos, delta, p: PhysParams):
        h2, h9 = p.h * p.h, p.h ** 9
        c6 = 315.0 / (64.0 * _PI)
        iax = [pos[a][:, None, :] for a in range(3)]
        padded = [_pad(pos[a], pad, FAR) for a in range(3)]

        def dz_body(rho, oz):
            wins = _shift_windows(padded, r, s, w, oz, m)
            for oy in range(-w, w + 1):
                for ox in range(-w, w + 1):
                    o = m + oy * r + ox
                    dx = iax[0] - wins[0][:, o:o + s][None]
                    dy = iax[1] - wins[1][:, o:o + s][None]
                    dz = iax[2] - wins[2][:, o:o + s][None]
                    diff = h2 - (dx * dx + dy * dy + dz * dz)
                    wk = jnp.where(diff > 0, diff * diff * diff, 0.0)
                    g = _gate(r, s, oz, oy, ox, delta)
                    rho = rho + jnp.sum(wk, axis=1) * g
            return rho, None

        rho0 = jnp.zeros((k, s), jnp.float32)
        rho, _ = lax.scan(dz_body, rho0, jnp.arange(-w, w + 1))
        return rho * (p.mass * c6 / h9)

    return run


def make_force_pass(r: int, s: int, k: int, w: int, *, xsph: float = 0.0,
                    alpha_visc: float = 0.0):
    """Pressure + viscosity (+ optional XSPH / Monaghan artificial viscosity)
    over the slot grid at scan radius ``w``.

    Transcribes VelPos.compute:49-105: fresh window center over stale
    buckets, stale ρ, per-pair ρ_j>ε guard (folded into irho2), final
    m²/ρ_i scaling applied only when ρ_i>ε. The j==i self pair contributes
    exactly 0 through the ε guards (as in cellops), so no id compare is
    needed. Extension terms match ops.extensions exactly.

    Returns (forces f32[3,K,S], xsph_dv f32[3,K,S] | None).
    """
    m = w * (r + 1)
    pad = w * (r * r + r + 1)
    use_x, use_a = xsph != 0.0, alpha_visc != 0.0
    n_extra = (3 if use_a else 0) + (3 if use_x else 0)

    def run(pos, vel, rho, press, irho2, delta, p: PhysParams):
        h2, h6, h9 = p.h * p.h, p.h ** 6, p.h ** 9
        cp = (45.0 / _PI) / h6        # pressure/viscosity kernel constant
        c6 = (315.0 / (64.0 * _PI)) / h9
        cs = jnp.sqrt(p.gas_constant)

        iax = [pos[a][:, None, :] for a in range(3)]
        ivl = [vel[a][:, None, :] for a in range(3)]
        pri = press[:, None, :]
        rhoi = rho[:, None, :]

        jfields = ([_pad(pos[a], pad, FAR) for a in range(3)]
                   + [_pad(vel[a], pad, 0.0) for a in range(3)]
                   + [_pad(press, pad, 0.0), _pad(irho2, pad, 0.0)]
                   + ([_pad(rho, pad, 0.0)] if (use_x or use_a) else []))

        acc0 = tuple(jnp.zeros((k, s), jnp.float32)
                     for _ in range(6 + n_extra))

        def dz_body(acc, oz):
            wins = _shift_windows(jfields, r, s, w, oz, m)
            for oy in range(-w, w + 1):
                for ox in range(-w, w + 1):
                    o = m + oy * r + ox
                    jf = [wf[:, o:o + s][None] for wf in wins]
                    dx = iax[0] - jf[0]
                    dy = iax[1] - jf[1]
                    dz = iax[2] - jf[2]
                    r2 = dx * dx + dy * dy + dz * dz
                    abs_r = jnp.sqrt(r2)
                    diff = p.h - abs_r
                    valid = (diff > EPSILON) & (abs_r > EPSILON)
                    safe = jnp.where(valid, abs_r, 1.0)
                    # (h−r)³/r radial profile (VelPos:33-38), constant later
                    gwp = jnp.where(valid, (diff * diff * diff) / safe, 0.0)
                    # (p_i+p_j)/(2ρ_j): the 1/(2ρ_j) guard rides irho2_j
                    pc = (pri + jf[6]) * jf[7] * gwp
                    # viscosity: (h−r)/(2ρ_j); ×2 and constants applied later
                    vc = jnp.where(abs_r < p.h, diff, 0.0) * jf[7]
                    g = _gate(r, s, oz, oy, ox, delta)
                    out = [acc[0] + jnp.sum(pc * dx, 1) * g,
                           acc[1] + jnp.sum(pc * dy, 1) * g,
                           acc[2] + jnp.sum(pc * dz, 1) * g,
                           acc[3] + jnp.sum(vc * (jf[3] - ivl[0]), 1) * g,
                           acc[4] + jnp.sum(vc * (jf[4] - ivl[1]), 1) * g,
                           acc[5] + jnp.sum(vc * (jf[5] - ivl[2]), 1) * g]
                    i = 6
                    if use_a:
                        # Π = −α·cs·h(v·r)/(r²+0.01h²)/ρ̄ for approaching
                        # pairs (extensions.artificial_viscosity_slotted)
                        dvx = ivl[0] - jf[3]
                        dvy = ivl[1] - jf[4]
                        dvz = ivl[2] - jf[5]
                        vr = dvx * dx + dvy * dy + dvz * dz
                        rho_bar = 0.5 * (rhoi + jf[8])
                        mu = p.h * vr / (r2 + 0.01 * h2)
                        pi_av = jnp.where(
                            (vr < 0) & (rho_bar > EPSILON),
                            -jnp.float32(alpha_visc) * cs * mu
                            / jnp.maximum(rho_bar, EPSILON), 0.0)
                        av = pi_av * gwp
                        out.extend([acc[i] + jnp.sum(av * dx, 1) * g,
                                    acc[i + 1] + jnp.sum(av * dy, 1) * g,
                                    acc[i + 2] + jnp.sum(av * dz, 1) * g])
                        i += 3
                    if use_x:
                        # XSPH: Σ 2m/(ρ_i+ρ_j)·W·(v_j−v_i)
                        # (extensions.xsph_slotted); W constant applied later
                        diff2 = h2 - r2
                        wk = jnp.where(diff2 > 0, diff2 ** 3, 0.0)
                        den = rhoi + jf[8]
                        xc = jnp.where(den > EPSILON, 2.0 * p.mass
                                       / jnp.maximum(den, EPSILON), 0.0) * wk
                        out.extend([
                            acc[i] + jnp.sum(xc * (jf[3] - ivl[0]), 1) * g,
                            acc[i + 1] + jnp.sum(xc * (jf[4] - ivl[1]), 1) * g,
                            acc[i + 2] + jnp.sum(xc * (jf[5] - ivl[2]), 1) * g])
                    acc = tuple(out)
            return acc, None

        acc, _ = lax.scan(dz_body, acc0, jnp.arange(-w, w + 1))

        # Final scaling (VelPos.compute:101-105): ×m²/ρ_i (press),
        # ×μm²/ρ_i (vis), applied only when ρ_i > ε — otherwise the raw
        # kernel-constant accumulations pass through, exactly as the HLSL
        # leaves f_press/f_vis unscaled when the guard fails.
        i_ok = rho > EPSILON
        safe_i = jnp.where(i_ok, rho, 1.0)
        sp = jnp.where(i_ok, p.mass * p.mass / safe_i, 1.0)
        sv = jnp.where(i_ok, p.viscosity * p.mass * p.mass / safe_i, 1.0)
        f = [acc[a] * cp * sp + acc[3 + a] * (2.0 * cp) * sv
             for a in range(3)]
        i = 6
        if use_a:
            # m²·Π·∇W with no ρ_i scaling (extensions.py)
            f = [f[a] + acc[i + a] * cp * (p.mass * p.mass) for a in range(3)]
            i += 3
        dv = None
        if use_x:
            dv = jnp.stack([jnp.float32(xsph) * acc[i + a] * c6
                            for a in range(3)])
        return jnp.stack(f), dv

    return run


def attach_density(frame: DenseFrame, rho: jax.Array, p: PhysParams
                   ) -> DenseFrame:
    """Store the frame's stale density and its derived per-slot quantities:
    EOS pressure (VelPos:61,87) and the guarded 1/(2ρ) (VelPos:91)."""
    press = p.gas_constant * (rho - p.rest_density)
    irho2 = jnp.where(rho > EPSILON, 0.5 / jnp.maximum(rho, EPSILON), 0.0)
    return frame._replace(rho=rho, press=press, irho2=irho2)


def integrate_slots(frame: DenseFrame, forces: jax.Array,
                    xsph_dv: jax.Array | None, p: PhysParams):
    """Wall penalty + gravity + NaN trap + semi-implicit Euler + clamp in
    slot space (VelPos.compute:107-157), componentwise so no trailing-3
    arrays materialize. Empty slots are held at FAR/0. Returns
    (frame', nan_mask bool[K,S])."""
    px, py, pz = frame.pos[0], frame.pos[1], frame.pos[2]
    vx, vy, vz = frame.vel[0], frame.vel[1], frame.vel[2]

    def pen(c):  # per-axis penetration depth (VelPos:110-123)
        return jnp.where(c < p.h, p.h - c,
                         jnp.where(c > 1.0 - p.h, 1.0 - c - p.h, 0.0))

    rx, ry, rz = pen(px), pen(py), pen(pz)
    ddot = (jnp.where(rx != 0.0, p.damping, 0.0) * vx
            + jnp.where(ry != 0.0, p.damping, 0.0) * vy
            + jnp.where(rz != 0.0, p.damping, 0.0) * vz)
    active = jnp.maximum(jnp.abs(rx), jnp.maximum(jnp.abs(ry),
                                                  jnp.abs(rz))) > 0.0
    # scalar dot(damp, v) subtracted from ALL components (VelPos:135 quirk)
    fwx = jnp.where(active, (rx * p.stiffness - ddot) * p.mass, 0.0)
    fwy = jnp.where(active, (ry * p.stiffness - ddot) * p.mass, 0.0)
    fwz = jnp.where(active, (rz * p.stiffness - ddot) * p.mass, 0.0)

    ax = (forces[0] + fwx) / p.mass
    ay = p.gravity_y + (forces[1] + fwy) / p.mass
    az = (forces[2] + fwz) / p.mass

    nan = (jnp.isnan(ax) | jnp.isnan(ay) | jnp.isnan(az)) & frame.occ
    nvx = jnp.where(nan, 0.0, vx + ax * p.dt)
    nvy = jnp.where(nan, 0.0, vy + ay * p.dt)
    nvz = jnp.where(nan, 0.0, vz + az * p.dt)
    advx = nvx if xsph_dv is None else nvx + xsph_dv[0]
    advy = nvy if xsph_dv is None else nvy + xsph_dv[1]
    advz = nvz if xsph_dv is None else nvz + xsph_dv[2]
    npx = jnp.clip(px + p.dt * advx, 0.0, 1.0)
    npy = jnp.clip(py + p.dt * advy, 0.0, 1.0)
    npz = jnp.clip(pz + p.dt * advz, 0.0, 1.0)

    occ = frame.occ
    pos = jnp.stack([jnp.where(occ, c, FAR) for c in (npx, npy, npz)])
    vel = jnp.stack([jnp.where(occ, c, 0.0) for c in (nvx, nvy, nvz)])
    return frame._replace(pos=pos, vel=vel), nan


def extract_particles(frame: DenseFrame, old_pos: jax.Array,
                      old_vel: jax.Array):
    """Slot grid → particle-order arrays. Capacity-dropped particles carry
    their previous state through the frame (and are counted in overflow)."""
    k, s = frame.occ.shape
    idx = jnp.clip(frame.slot_of, 0, k * s - 1)
    ok = frame.slotted[:, None]
    pos = jnp.where(ok, jnp.stack([frame.pos[a].reshape(-1)[idx]
                                   for a in range(3)], -1), old_pos)
    vel = jnp.where(ok, jnp.stack([frame.vel[a].reshape(-1)[idx]
                                   for a in range(3)], -1), old_vel)
    return pos, vel


def gather_slot_scalar(frame: DenseFrame, arr: jax.Array, fill=0):
    """Per-slot scalar [K,S] → per-particle [N] (dropped particles get
    ``fill``)."""
    k, s = frame.occ.shape
    idx = jnp.clip(frame.slot_of, 0, k * s - 1)
    return jnp.where(frame.slotted, arr.reshape(-1)[idx], fill)
