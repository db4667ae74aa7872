"""Round-3 TPU probe: fused-substep kernel A/B vs the v6 two-stage path,
plus knob sweeps. Subprocess-per-stage with SIGALRM watchdogs and os._exit
(normal interpreter teardown can crash the tunneled TPU worker), TPU
recovery polling between stages.

Usage: python scripts/probe_r3_tpu.py [stage-filter-substring]
"""
import os
import subprocess
import sys
import time

STAGE_SRC = r"""
import os, signal, sys
sys.path.insert(0, "/root/repo")

def on_alarm(*a):
    print("ALARM: stage timed out", flush=True)
    os._exit(9)

signal.signal(signal.SIGALRM, on_alarm)
signal.alarm(int(sys.argv[2]))

import jax, jax.numpy as jnp
from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
from sphfluidsimulation_tpu.bench import run_bench
enable_compilation_cache()
float(jnp.sum(jnp.ones(8)))
n, frames = int(sys.argv[1]), int(sys.argv[3])
r = run_bench(n_particles=n, frames=frames, neighbor="pallas")
print(f"RESULT {r['value']:.4g} {r['unit']} compile={r['compile_plus_warmup_s']}s "
      f"cert={r['exact_cert_total']} ovf={r['overflow_max']} "
      f"tune={r['pallas_tuning']}", flush=True)
os._exit(0)
"""


def wait_tpu(max_wait=2400):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        rc = subprocess.run(
            [sys.executable, "-c",
             "import signal,sys,os;signal.alarm(90);import jax,jax.numpy as j;"
             "float(j.sum(j.ones(8)));print('up',flush=True);os._exit(0)"],
            capture_output=True, text=True, timeout=150)
        if rc.returncode == 0 and "up" in rc.stdout:
            return True
        print(f"  tpu not ready (rc={rc.returncode}); waiting", flush=True)
        time.sleep(30)
    return False


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    stages = [
        ("fused_262k", {"SPH_PALLAS_FUSED": "1"}, 1 << 18, 20, 1500),
        ("unfused_262k", {"SPH_PALLAS_FUSED": "0"}, 1 << 18, 20, 1500),
        ("fused_1m", {"SPH_PALLAS_FUSED": "1"}, 1 << 20, 20, 1800),
        ("fused_u8_262k", {"SPH_PALLAS_FUSED": "1", "SPH_PALLAS_UNROLL": "8"},
         1 << 18, 20, 1500),
        ("fused_u8_1m", {"SPH_PALLAS_FUSED": "1", "SPH_PALLAS_UNROLL": "8"},
         1 << 20, 20, 1800),
    ]
    for name, env_over, n, frames, budget in stages:
        if filt and filt not in name:
            continue
        if not wait_tpu():
            print("TPU never recovered; aborting", flush=True)
            return
        env = dict(os.environ)
        env.update(env_over)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", STAGE_SRC, str(n), str(budget),
             str(frames)],
            capture_output=True, text=True, timeout=budget + 120, env=env)
        out = (p.stdout + p.stderr).strip().splitlines()
        tail = [l for l in out if "RESULT" in l or "ALARM" in l
                or "Error" in l][-2:]
        print(f"{name} n={n}: rc={p.returncode} wall={time.time()-t0:.0f}s "
              f"{' | '.join(tail) if tail else (out[-1] if out else '')}",
              flush=True)


if __name__ == "__main__":
    main()
