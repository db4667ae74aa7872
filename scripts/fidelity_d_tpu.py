#!/usr/bin/env python
"""FIDELITY Part D (b, c): f32 backend trajectories + dt sensitivity.

Modes (argv[1]):
  traj-pallas   frames 1-5 @65k golden, pallas f32 (TPU), save npz
  traj-pallas-kahan  same with tune.kahan (compensated pair sums) — the
                VERDICT r4 item-7 walk-order experiment: if the frame-1
                oracle-tracking gap vs slotted is summation-order chaos,
                compensation closes it
  traj-sites    frames 1-5 @65k golden, sites f32 (TPU), save npz
  traj-slotted  frames 1-5 @65k golden, slotted f32 (CPU), save npz
  dt            golden 65k at substep dt x1, x1/5, x1/25 (pallas, TPU):
                does the explosion survive smaller timesteps? separates
                "EOS is violently stiff" from "dt too big for the EOS".

Each trajectory is compared against examples/fidelity_d/oracle_65k.npz
(float64 reference-pipeline oracle) by scripts/fidelity_d_compare.py.

TPU modes exit via os._exit (normal interpreter teardown crashes the
tunneled worker — BENCH_NOTES.md "Operational gotcha") and carry SIGALRM
watchdogs (in-flight dispatches hang forever during worker recovery).
"""

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "traj-pallas"
ON_TPU = MODE != "traj-slotted"
if not ON_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


def on_alarm(*a):
    print("ALARM: timed out", flush=True)
    os._exit(9)


signal.signal(signal.SIGALRM, on_alarm)
signal.alarm(int(os.environ.get("FID_D_BUDGET", "2400")))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

from sphfluidsimulation_tpu.bench import scaled_config  # noqa: E402
from sphfluidsimulation_tpu.sim.stepper import (  # noqa: E402
    initial_state, make_frame_step)
from sphfluidsimulation_tpu.utils.compcache import (  # noqa: E402
    enable_compilation_cache)

N_FRAMES = 5
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "fidelity_d")


def _retry(f, tries=8, wait=25):
    """Individual remote tpu_compile_helper requests 500 while the fleet
    reinitializes after a worker crash; compiled Mosaic kernels are cached
    in-process, so retrying the same jit call accumulates progress."""
    for t in range(tries):
        try:
            return f()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "remote_compile" not in msg and "Mosaic" not in msg:
                raise
            print(f"  compile retry {t}: {msg[:90]}", flush=True)
            time.sleep(wait)
    raise RuntimeError("compile retries exhausted")


def run_traj(neighbor: str, tag: str | None = None, tune=None) -> int:
    cfg = scaled_config(1 << 16)
    st = initial_state(cfg)
    step = jax.jit(make_frame_step(cfg, neighbor=neighbor,
                                   pallas_tune=tune))
    t0 = time.time()
    frames, vels = [], []
    for fr in range(N_FRAMES):
        st, m = (_retry(lambda: step(st)) if fr == 0 and ON_TPU
                 else step(st))
        frames.append(np.asarray(st.pos))
        vels.append(np.asarray(st.vel))
        print(f"frame {fr + 1}: mean_rho={float(m.mean_density):.6f} "
              f"max_v={float(m.max_speed):.4g} "
              f"nan={int(jnp.sum(st.nan_count))} cert={int(m.exact_cert)} "
              f"t={time.time() - t0:.0f}s", flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{tag or neighbor}_65k.npz")
    np.savez_compressed(path, pos=np.stack(frames), vel=np.stack(vels),
                        n=cfg.n_particles, r=cfg.bucket_resolution)
    print(f"saved {path} ({time.time() - t0:.0f}s)", flush=True)
    return 0


def run_dt() -> int:
    base = scaled_config(1 << 16)
    for scale in (1, 5, 25):
        cfg = base.replace(frame_dt=base.frame_dt / scale)
        st = initial_state(cfg)
        step = jax.jit(make_frame_step(cfg, neighbor="pallas"))
        t0 = time.time()
        mv_trace = []
        for fr in range(N_FRAMES):
            st, m = _retry(lambda: step(st)) if fr == 0 else step(st)
            mv_trace.append(float(m.max_speed))
        print(f"dt/{scale:<3} substep_dt={cfg.substep_dt:.3e} "
              f"max_v per frame: "
              + " ".join(f"{v:.3g}" for v in mv_trace)
              + f"  mean_rho={float(m.mean_density):.4f} "
              f"nan={int(jnp.sum(st.nan_count))} "
              f"({time.time() - t0:.0f}s)", flush=True)
    return 0


def main() -> int:
    enable_compilation_cache()
    float(jnp.sum(jnp.ones(8)))  # device up-front
    if MODE == "traj-pallas-kahan":
        from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
        return run_traj("pallas", tag="pallas-kahan",
                        tune=PallasTuning(kahan=True))
    if MODE == "traj-pallas-exact":
        # op-cut knobs OFF: isolates whether the frame-1 tracking gap vs
        # slotted comes from fuse_acc/pj/intcell's ~ulp term regrouping
        # (the Kahan leg refuted the running-sum-rounding hypothesis)
        from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
        return run_traj("pallas", tag="pallas-exact",
                        tune=PallasTuning(fuse_acc=False, intcell=False,
                                          pj=False))
    if MODE.startswith("traj-"):
        return run_traj(MODE.split("-", 1)[1])
    if MODE == "dt":
        return run_dt()
    print(f"unknown mode {MODE}")
    return 2


if __name__ == "__main__":
    rc = main()
    if ON_TPU:
        sys.stdout.flush()
        os._exit(rc)
    sys.exit(rc)
