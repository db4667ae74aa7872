"""Bisect the 1M banded-sites TPU worker fault: run each pipeline stage in
a fresh subprocess (a wedged runtime cannot poison later stages), smallest
composition first.

Stages: binding (sort-only), density (one banded pass), force (one banded
force pass), frame (5-substep step), roll3 (3-frame rollout).
"""
import subprocess
import sys

STAGE_SRC = r"""
import signal, sys, os, time
sys.path.insert(0, "/root/repo")
signal.signal(signal.SIGALRM, lambda *a: (print("ALARM", flush=True), os._exit(9)))
signal.alarm(int(sys.argv[3]))
import jax, jax.numpy as jnp
from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
from sphfluidsimulation_tpu.bench import scaled_config
from sphfluidsimulation_tpu.params import PhysParams
from sphfluidsimulation_tpu.sim.stepper import initial_state, make_frame_step, make_rollout
from sphfluidsimulation_tpu.ops import sites
enable_compilation_cache()
float(jnp.sum(jnp.ones(8)))
stage, n = sys.argv[1], int(sys.argv[2])
cfg = scaled_config(n, site_capacity=16)
r = cfg.bucket_resolution
nb = sites.auto_bands(r)
p = PhysParams.from_config(cfg)
st = initial_state(cfg)
t0 = time.time()
if stage == "binding":
    cid, in_cap, ovf = jax.jit(lambda x: sites.frame_binding(x, r, cfg.voxel_capacity))(st.pos)
    print(f"OK binding ovf={int(ovf)} t={time.time()-t0:.0f}s", flush=True)
elif stage == "density":
    cid, in_cap, ovf = sites.frame_binding(st.pos, r, cfg.voxel_capacity)
    rho, cert = jax.jit(lambda pos, cid, ic: sites.density_sites(
        pos, cid, ic, p, r, 16, 16, z_bands=nb))(st.pos, cid, in_cap)
    print(f"OK density cert={int(cert)} mean={float(jnp.mean(rho)):.4f} t={time.time()-t0:.0f}s", flush=True)
elif stage == "force":
    cid, in_cap, ovf = sites.frame_binding(st.pos, r, cfg.voxel_capacity)
    rho, cert = sites.density_sites(st.pos, cid, in_cap, p, r, 16, 16, z_bands=nb)
    f, dv, c2 = jax.jit(lambda pos, vel, rho, cid, ic: sites.fluid_forces_sites(
        pos, vel, rho, cid, ic, p, r, 16, 16, z_bands=nb))(st.pos, st.vel, rho, cid, in_cap)
    print(f"OK force cert={int(c2)} max|f|={float(jnp.max(jnp.abs(f))):.3g} t={time.time()-t0:.0f}s", flush=True)
elif stage == "frame":
    step = jax.jit(make_frame_step(cfg, neighbor="sites"))
    s2, m = step(st)
    jax.block_until_ready(s2.pos)
    print(f"OK frame cert={int(m.exact_cert)} t={time.time()-t0:.0f}s", flush=True)
elif stage == "roll3":
    roll = make_rollout(cfg, 3, neighbor="sites")
    s2, m = roll(st)
    jax.block_until_ready(s2.pos)
    print(f"OK roll3 cert={int(jnp.sum(m.exact_cert))} t={time.time()-t0:.0f}s", flush=True)
os._exit(0)
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    stages = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "binding", "density", "force", "frame", "roll3"]
    for stage in stages:
        t = {"binding": 600, "density": 1200, "force": 1500,
             "frame": 1800, "roll3": 1800}[stage]
        print(f"--- {stage} n={n}", flush=True)
        rc = subprocess.run([sys.executable, "-c", STAGE_SRC, stage,
                             str(n), str(t)], timeout=t + 300)
        print(f"exit={rc.returncode}", flush=True)
        if rc.returncode != 0:
            print(f"stage {stage} FAILED; stopping", flush=True)
            break


if __name__ == "__main__":
    main()
