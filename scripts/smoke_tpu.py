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

Exit code 0 == pass. Exits via os._exit after printing one JSON line
(normal interpreter teardown can crash the tunneled TPU worker).
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arm(seconds: int) -> None:
    def on_alarm(*a):
        print(json.dumps({"smoke": "FAIL", "error": "stage timeout"}),
              flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main() -> int:
    t_start = time.time()
    _arm(600)
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

    cfg = scaled_config(1 << 14)  # golden physics at 16k, R=19
    state0 = initial_state(cfg)
    phys = PhysParams.from_config(cfg)

    step_p = jax.jit(make_param_step(cfg, neighbor="pallas"))
    step_s = jax.jit(make_param_step(cfg, neighbor="slotted"))

    s_p, m_p = step_p(state0, phys)
    s_s, m_s = step_s(state0, phys)
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
        "cert_zero": cert == 0,
        "overflow_matches_grid": ovf_pallas == ovf_grid,
        "tracks_slotted_1e-5": maxerr < 1e-5,
        "finite_in_cube": finite and in_cube,
    }
    ok = all(checks.values())
    print(json.dumps({
        "smoke": "PASS" if ok else "FAIL",
        "device": dev,
        "n": cfg.n_particles,
        "exact_cert": cert,
        "overflow_pallas": ovf_pallas,
        "overflow_grid": ovf_grid,
        "frame1_maxerr_vs_slotted": maxerr,
        "checks": checks,
        "elapsed_s": round(time.time() - t_start, 1),
    }), flush=True)
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    sys.exit(main())
