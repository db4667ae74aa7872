#!/usr/bin/env python
"""Driver-runnable TPU smoke test (~2 min with warm compile cache).

One frame of the golden-scaled dam-break at 16k particles on the REAL TPU
(compiled Mosaic kernels, not interpret mode — the suite's CPU CI only
exercises pallas in interpret mode). Asserts:

  1. exact_cert == 0  — the pallas candidate walk covered exactly the
     reference candidate set (no drift/clip truncation on frame 1);
  2. pallas overflow == grid.overflow_count — the bucket-capacity drop
     population matches the reference bucket build (Bucket.compute:30-35);
  3. frame-1 positions track the slotted backend (the pinned XLA
     reference path) to < 1e-5 for EVERY particle;
  4. positions finite and inside [0, 1]^3 (VelPos.compute:154).

Round-5 additions (VERDICT r4 item 6 — the standing compiled-path gate):

  5. VIOLENT stage: two frames of the golden-scaled 16k config (the
     flagship's exploding EOS) with cert / NaN-trap / overflow counts
     asserted inside pinned bands — calm configs hide miscompiles that
     only violent walks expose (the round-3 intcell episode), and
     same-binary reruns reproduce these counts bit-exactly
     (BENCH_NOTES round 4), so a band breach means the kernel changed.
  6. SLAB sp=1 stage: one compiled slab_pallas step on the real chip
     (the banded build_frame + halo no-op path had only ever run in
     CPU-interpret mesh tests), asserting cert 0 and single-device
     trajectory agreement.

Exit code 0 == pass. Exits via os._exit after printing one JSON line
(normal interpreter teardown can crash the tunneled TPU worker).
SPH_SMOKE_PIN=1 prints the violent stage's measured counts without
asserting bands (used once per intentional kernel change to re-pin).
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_STAGE = {"name": "init", "t0": time.time()}


def _arm(seconds: int, stage: str | None = None) -> None:
    if stage is not None:
        _STAGE["name"] = stage
        _STAGE["t0"] = time.time()
        print(f"stage: {stage}", flush=True)

    def on_alarm(*a):
        print(json.dumps({
            "smoke": "FAIL", "error": "stage timeout",
            "stage": _STAGE["name"],
            "stage_elapsed_s": round(time.time() - _STAGE["t0"], 1),
        }), flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main() -> int:
    t_start = time.time()
    _arm(1200, "imports+calm")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sphfluidsimulation_tpu.bench import scaled_config
    from sphfluidsimulation_tpu.ops.grid import build_bucket, overflow_count
    from sphfluidsimulation_tpu.sim.stepper import (initial_state,
                                                    make_param_step)
    from sphfluidsimulation_tpu.params import PhysParams
    from sphfluidsimulation_tpu.utils.compcache import \
        enable_compilation_cache

    enable_compilation_cache()
    dev = str(jax.devices()[0])

    # The ASSERTED stage runs a CALM 16k config: the golden EOS at 16k is
    # explosive (certificates legitimately fire and frame-1 cross-backend
    # error is overflow chaos, FIDELITY.md Parts C/D), so cert==0 and
    # slotted-tracking are only well-posed guarantees on a calm flow.
    from sphfluidsimulation_tpu.config import SimConfig
    cfg = SimConfig(particle_number=1 << 14, bucket_resolution=19,
                    preset=0, gas_constant=20.0, rest_density=1.7,
                    viscosity=0.05, stiffness_coefficient=1000.0,
                    frame_dt=1 / 240)
    state0 = initial_state(cfg)
    phys = PhysParams.from_config(cfg)

    step_p = jax.jit(make_param_step(cfg, neighbor="pallas"))
    step_s = jax.jit(make_param_step(cfg, neighbor="slotted"))

    # two frames: frame 1 can legitimately certify a handful of rows
    # (spawn jitter parks positions outside the unit cube until the first
    # clamp, VelPos.compute:154); the steady-state guarantee is frame 2+
    s_p, m_p1 = step_p(state0, phys)
    s_s, _ = step_s(state0, phys)
    s_p, m_p = step_p(s_p, phys)
    s_s, m_s = step_s(s_s, phys)
    pos_p = np.asarray(s_p.pos)
    pos_s = np.asarray(s_s.pos)

    cert = int(m_p.exact_cert)
    ovf_pallas = int(m_p.overflow)
    bucket, _ = build_bucket(state0.pos, cfg.bucket_resolution,
                             cfg.voxel_capacity)
    ovf_grid = int(overflow_count(bucket))
    maxerr = float(np.max(np.abs(pos_p - pos_s)))
    finite = bool(np.isfinite(pos_p).all())
    in_cube = bool((pos_p >= 0).all() and (pos_p <= 1).all())

    checks = {
        "cert_zero_frame2": cert == 0,
        "overflow_matches_grid": ovf_pallas == ovf_grid,
        "tracks_slotted_1e-5": maxerr < 1e-5,
        "finite_in_cube": finite and in_cube,
    }
    ok = all(checks.values())

    # VIOLENT stage (asserted): two frames of the flagship physics at 16k.
    # Chaotic trajectories forbid cross-backend position pins here, but the
    # cert / trap / overflow POPULATIONS are deterministic on a fixed
    # binary (same-chip reruns reproduce them bit-exactly, BENCH_NOTES r4)
    # — pinned bands catch the miscompile class calm configs hide.
    # Re-pin with SPH_SMOKE_PIN=1 after any INTENTIONAL kernel change.
    _arm(900, "violent")
    gcfg = scaled_config(1 << 14)
    gstate0 = initial_state(gcfg)
    gphys = PhysParams.from_config(gcfg)
    gstep = jax.jit(make_param_step(gcfg, neighbor="pallas"))
    gs, gm1 = gstep(gstate0, gphys)
    gs, gm2 = gstep(gs, gphys)
    gnan = int(gm1.nan_events) + int(gm2.nan_events)
    gcert10 = int(gm1.exact_cert) + int(gm2.exact_cert)
    for _ in range(8):  # traps first fire several frames into the blowup
        gs, gmi = gstep(gs, gphys)
        gnan += int(gmi.nan_events)
        gcert10 += int(gmi.exact_cert)
    violent_report = {
        "cert_f1": int(gm1.exact_cert), "cert_f2": int(gm2.exact_cert),
        "cert_10f_total": gcert10,
        "nan_10f_total": gnan,
        "ovf_f1": int(gm1.overflow),
    }
    g_in_cube = bool((np.asarray(gs.pos) >= 0).all()
                     and (np.asarray(gs.pos) <= 1).all())
    violent_report["in_cube"] = g_in_cube
    pin_mode = os.environ.get("SPH_SMOKE_PIN", "0") == "1"
    # Bands pinned on the v5e, round 5 (post self-pair-skip kernels);
    # ±~35% margins absorb toolchain drift, not semantic change. ovf_f1
    # is banded rather than grid-matched: the rollout's occ count also
    # drops out-of-cube spawn-jitter particles (flat-id aliasing
    # semantics), which overflow_count(bucket) does not see — the EXACT
    # grid match is asserted by the calm stage above.
    # pinned v5e round-5 values: cert_f1 10461, cert_f2 4935,
    # cert_10f_total 43226, ovf_f1 2993, nan_10f_total 0 (the 16k golden
    # blowup reaches no NaN within 10 frames — the nan band is an upper
    # bound catching trap-count explosions; certs carry the signal)
    VIOLENT_BANDS = {
        "cert_f1": (6800, 14100), "cert_f2": (3200, 6700),
        "cert_10f_total": (28000, 58000),
        "nan_10f_total": (0, 300000),
        "ovf_f1": (1900, 4100),
    }
    violent_checks = {"violent_in_cube": g_in_cube}
    if not pin_mode:
        for k, (lo, hi) in VIOLENT_BANDS.items():
            violent_checks[f"violent_{k}_band"] = \
                lo <= violent_report[k] <= hi
    checks.update(violent_checks)
    ok = ok and all(violent_checks.values())

    # SLAB sp=1 stage (asserted): one compiled slab_pallas step on the
    # real chip — banded build_frame + halo/migration no-op path, never
    # previously compiled outside CPU-interpret mesh tests.
    _arm(900, "slab_sp1")
    from jax.sharding import Mesh
    from sphfluidsimulation_tpu.parallel import slab, slab_pallas
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("sp",))
    sstep, sspec = slab_pallas.make_pallas_slab_step(cfg, mesh1,
                                                     row_slack=4.0)
    sstep = jax.jit(sstep)
    sst = slab.distribute(state0, cfg, sspec, mesh1)
    sst, sm = sstep(sst, phys)
    sst, sm = sstep(sst, phys)
    sout, lost = slab.collect(sst, cfg.n_particles)
    # the calm reference trajectory: the asserted stage's 2-frame pallas
    # positions (pos_p) — same physics, same tier
    slab_err = float(np.max(np.abs(np.asarray(sout.pos) - pos_p)))
    slab_checks = {
        "slab_sp1_cert_zero": int(sm.exact_cert) == 0,
        "slab_sp1_lost_zero": lost == 0,
        "slab_sp1_tracks_single": slab_err < 2e-5,
    }
    checks.update(slab_checks)
    ok = ok and all(slab_checks.values())

    print(json.dumps({
        "smoke": "PASS" if ok else "FAIL",
        "device": dev,
        "n": cfg.n_particles,
        "exact_cert_frame2": cert,
        "exact_cert_frame1_spawn": int(m_p1.exact_cert),
        "overflow_pallas": ovf_pallas,
        "overflow_grid": ovf_grid,
        "frame1_maxerr_vs_slotted": maxerr,
        "checks": checks,
        "violent_report": violent_report,
        "pin_mode": pin_mode,
        "slab_sp1_maxerr": slab_err,
        "elapsed_s": round(time.time() - t_start, 1),
    }), flush=True)
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    sys.exit(main())
