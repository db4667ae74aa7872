#!/usr/bin/env python
"""FIDELITY Part D (a): float64 oracle at 65k, frames 1-5, on CPU.

A chunked numpy float64 transcription of the reference pipeline
(SphFluidSimulation.cs:96-108 semantics with fixed frame dt):

  bucket build (stale, 32-slot rank drop, Bucket.compute:18-36)
  -> density once per frame (poly6 incl. self term, Density.compute:32-60)
  -> 5 x [pressure (h-r)^3 + viscosity + wall (scalar dot(damp,v) quirk)
          + gravity + NaN trap + semi-implicit Euler + clamp]
          (VelPos.compute:49-157)

run from the exact f32 preset spawn (models/presets.py) promoted to f64.
Frames 1-5 positions are saved to examples/fidelity_d/oracle_65k.npz; the
f32 backends' trajectories (computed separately — slotted on CPU here,
pallas/sites on the TPU by scripts/fidelity_d_tpu.py) are compared against
this truth by scripts/fidelity_d_compare.py, separating f32
summation-order error from implementation error.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# force-set + live-config update: the harness pins JAX_PLATFORMS=axon and
# its sitecustomize imports jax at interpreter start, so setdefault alone
# leaves the preset-spawn jax call dispatching to the (possibly down) TPU
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N_FRAMES = 5
CHUNK = 4096
GRAVITY_Y = -9.8
EPS = 1e-6
CAP = 32


def build_bucket_np(pos: np.ndarray, r: int):
    """Dense slot table [R^3, 32] of particle ids (sentinel -1), stable
    rank-by-index drop (the deterministic rebuild of Bucket.compute:30-35)."""
    n = pos.shape[0]
    cell = (pos * (r - 1)).astype(np.int64)  # trunc toward 0 == HLSL int3
    cid = cell[:, 0] + cell[:, 1] * r + cell[:, 2] * (r * r)
    in_range = (cid >= 0) & (cid < r ** 3)
    order = np.lexsort((np.arange(n), np.where(in_range, cid, r ** 3)))
    cid_s = np.where(in_range, cid, r ** 3)[order]
    run_start = np.searchsorted(cid_s, cid_s, side="left")
    rank = np.arange(n) - run_start
    table = np.full((r ** 3 + 1, CAP), -1, np.int64)
    ok = (rank < CAP) & (cid_s < r ** 3)
    table[cid_s[ok], rank[ok]] = order[ok]
    return table[:r ** 3], cid


def window_candidates(table: np.ndarray, cell_i: np.ndarray, r: int):
    """[C, 27*32] candidate ids for a chunk of fresh cells (bounds-checked
    27-window, Density.compute:42-46 / VelPos.compute:67-76); -1 empty."""
    offs = np.array([(ox, oy, oz) for oz in (-1, 0, 1)
                     for oy in (-1, 0, 1) for ox in (-1, 0, 1)], np.int64)
    nb = cell_i[:, None, :] + offs[None, :, :]              # [C, 27, 3]
    ok = ((nb >= 0) & (nb < r)).all(-1)
    nid = nb[..., 0] + nb[..., 1] * r + nb[..., 2] * (r * r)
    nid = np.where(ok, nid, 0)
    cand = table[nid]                                        # [C, 27, 32]
    cand = np.where(ok[..., None], cand, -1)
    return cand.reshape(cand.shape[0], -1)


def density_pass(pos, table, r, h, mass):
    n = pos.shape[0]
    h2, h9 = h * h, h ** 9
    c6 = 315.0 / (64.0 * np.pi)
    rho = np.zeros(n)
    cell = (pos * (r - 1)).astype(np.int64)
    for a in range(0, n, CHUNK):
        b = min(a + CHUNK, n)
        cand = window_candidates(table, cell[a:b], r)
        pj = pos[np.clip(cand, 0, n - 1)]                    # [C, K, 3]
        live = (cand >= 0)[..., None]
        d = pos[a:b, None, :] - np.where(live, pj, 9.0)
        r2 = (d * d).sum(-1)
        diff = h2 - r2
        w = np.where(diff > 0, diff ** 3, 0.0)
        rho[a:b] = mass * c6 / h9 * w.sum(-1)
    return rho


def force_pass(pos, vel, rho, table, r, h, mass, gas_k, rho0, visc):
    """Fresh-centered window over the stale table (VelPos.compute:49-105)."""
    n = pos.shape[0]
    h6 = h ** 6
    cgrad = 45.0 / np.pi
    f = np.zeros((n, 3))
    cell = (pos * (r - 1)).astype(np.int64)                  # fresh cells
    press = gas_k * (rho - rho0)
    for a in range(0, n, CHUNK):
        b = min(a + CHUNK, n)
        cand = window_candidates(table, cell[a:b], r)
        idx = np.clip(cand, 0, n - 1)
        live = cand >= 0
        selfmask = cand == np.arange(a, b)[:, None]          # j==i skip :82
        use = live & ~selfmask
        pj = pos[idx]
        vj = vel[idx]
        rj = rho[idx]
        d = pos[a:b, None, :] - pj
        r2 = (d * d).sum(-1)
        abs_r = np.sqrt(r2)
        diff = h - abs_r
        valid = use & (diff > EPS) & (abs_r > EPS)
        gwp = np.where(valid, cgrad / h6 * diff ** 3
                       / np.where(valid, abs_r, 1.0), 0.0)
        gwv = np.where(use & (abs_r < h), cgrad / h6 * diff, 0.0)
        rho_ok = use & (rj > EPS)
        inv_rho = np.where(rho_ok, 1.0, 0.0) / np.where(rho_ok, rj, 1.0)
        pc = (press[a:b, None] + gas_k * (rj - rho0)) * 0.5 * inv_rho * gwp
        fp = (pc[..., None] * d).sum(1)
        vc = gwv * inv_rho
        fv = (vc[..., None] * (vj - vel[a:b, None, :])).sum(1)
        i_ok = rho[a:b] > EPS
        safe = np.where(i_ok, rho[a:b], 1.0)
        fp = np.where(i_ok[:, None], fp * (mass * mass / safe)[:, None], fp)
        fv = np.where(i_ok[:, None],
                      fv * (visc * mass * mass / safe)[:, None], fv)
        f[a:b] = fp + fv
    return f


def wall_force(pos, vel, h, stiff, damp, mass):
    low = h - pos
    high = 1.0 - pos - h
    rw = np.where(pos < h, low, np.where(pos > 1.0 - h, high, 0.0))
    dmask = np.where(rw != 0.0, damp, 0.0)
    ddot = (dmask * vel).sum(-1, keepdims=True)
    fw = (rw * stiff - ddot) * mass
    active = np.abs(rw).max(-1, keepdims=True) > 0
    return np.where(active, fw, 0.0)


def main() -> int:
    """argv: [dt_scale [n_frames]] — dt_scale > 1 runs the dt-sensitivity
    variant (substep dt divided by dt_scale, same pipeline, f64): if the
    golden 65k explosion survives a 5x/25x smaller timestep it is EOS
    physics; if it calms, the reference's own dt sits outside the stable
    regime of its EOS at this scale (either way the f32 backends are
    faithful). Saves oracle_dt{scale}_65k.npz."""
    t0 = time.time()
    from sphfluidsimulation_tpu.bench import scaled_config
    from sphfluidsimulation_tpu.models.presets import init_positions

    dt_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else N_FRAMES

    cfg = scaled_config(1 << 16)
    r = cfg.bucket_resolution
    h = cfg.effective_radius
    mass = cfg.particle_mass
    dt = cfg.substep_dt / dt_scale

    pos = np.asarray(init_positions(cfg), np.float64)
    vel = np.zeros_like(pos)
    frames = []
    vels = []
    nan_events = 0
    for fr in range(n_frames):
        table, _ = build_bucket_np(pos, r)
        rho = density_pass(pos, table, r, h, mass)
        for _ in range(cfg.substeps):
            ff = force_pass(pos, vel, rho, table, r, h, mass,
                            cfg.gas_constant, cfg.rest_density,
                            cfg.viscosity)
            fw = wall_force(pos, vel, h, cfg.stiffness_coefficient,
                            cfg.damping_coefficient, mass)
            acc = np.array([0.0, GRAVITY_Y, 0.0]) + (ff + fw) / mass
            nan = np.isnan(acc).any(-1)
            nan_events += int(nan.sum())
            vel = np.where(nan[:, None], 0.0, vel + acc * dt)
            pos = np.clip(pos + dt * vel, 0.0, 1.0)
        frames.append(pos.copy())
        vels.append(vel.copy())
        print(f"frame {fr + 1}: mean_rho={rho.mean():.6f} "
              f"max_v={np.abs(vel).max():.4g} nan={nan_events} "
              f"t={time.time() - t0:.0f}s", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "fidelity_d")
    os.makedirs(out, exist_ok=True)
    name = ("oracle_65k.npz" if dt_scale == 1
            else f"oracle_dt{dt_scale}_65k.npz")
    np.savez_compressed(
        os.path.join(out, name),
        pos=np.stack(frames), vel=np.stack(vels),
        n=cfg.n_particles, r=r, nan_events=nan_events,
        dt_scale=dt_scale)
    print(f"saved {out}/{name} ({time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
