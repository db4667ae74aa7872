"""Probe the pallas backend (v6 fresh-interval kernels) on the TPU:
262k and 1M golden workloads plus a ROWS/TPG/UNROLL knob sweep at 262k.
Same subprocess-watchdog structure as probe_sites_tpu.py.
"""
import subprocess
import sys
import time

STAGE_SRC = r"""
import signal, sys
sys.path.insert(0, "/root/repo")

def on_alarm(*a):
    print("ALARM: stage timed out", flush=True)
    sys.exit(9)

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
      f"cert={r['exact_cert_total']} ovf={r['overflow_max']}", flush=True)
"""


def wait_tpu(max_wait=2400):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        rc = subprocess.run(
            [sys.executable, "-c",
             "import signal,sys;signal.alarm(60);import jax,jax.numpy as j;"
             "float(j.sum(j.ones(8)));print('up')"],
            capture_output=True, text=True, timeout=120)
        if rc.returncode == 0 and "up" in rc.stdout:
            return True
        print(f"  tpu not ready (rc={rc.returncode}); waiting", flush=True)
        time.sleep(30)
    return False


def main():
    stages = [
        ("base", {}, 1 << 18, 20, 1200),
        ("base", {}, 1 << 20, 20, 1500),
        ("rows64", {"SPH_PALLAS_ROWS": "64", "SPH_PALLAS_TPG": "16"},
         1 << 18, 20, 1200),
        ("rows64u4", {"SPH_PALLAS_ROWS": "64", "SPH_PALLAS_TPG": "16",
                      "SPH_PALLAS_UNROLL": "4"}, 1 << 18, 20, 1200),
        ("u4", {"SPH_PALLAS_UNROLL": "4"}, 1 << 18, 20, 1200),
    ]
    import os
    for name, env_over, n, frames, budget in stages:
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
