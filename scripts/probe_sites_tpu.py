"""Probe the sites backend on the tunneled TPU, smallest first, with a
SIGALRM watchdog per stage (in-flight dispatches hang forever when the TPU
worker crashes; the alarm turns a hang into a visible failure).

Each stage runs in a fresh subprocess so a wedged runtime cannot poison
later stages. Prints one line per stage.
"""
import signal
import subprocess
import sys
import time

STAGE_SRC = r"""
import signal, sys, time
sys.path.insert(0, "/root/repo")

def on_alarm(*a):
    print("ALARM: stage timed out", flush=True)
    sys.exit(9)

signal.signal(signal.SIGALRM, on_alarm)
signal.alarm(int(sys.argv[4]))

import jax, jax.numpy as jnp
from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
from sphfluidsimulation_tpu.bench import run_bench
enable_compilation_cache()
float(jnp.sum(jnp.ones(8)))  # device up-check
n, frames, kcap = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
r = run_bench(n_particles=n, frames=frames, neighbor=sys.argv[5],
              site_capacity=(kcap if sys.argv[5] == "sites" else None))
print(f"RESULT {r['value']:.4g} {r['unit']} compile={r['compile_plus_warmup_s']}s "
      f"cert={r['exact_cert_total']} ovf={r['overflow_max']}", flush=True)
"""


def wait_tpu(max_wait=600):
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
        ("sites", 1 << 14, 10, 16, 600),
        ("sites", 1 << 16, 10, 16, 900),
        ("sites", 1 << 18, 20, 16, 900),
        ("sites", 1 << 20, 20, 16, 1200),
    ]
    for nb, n, frames, kcap, budget in stages:
        if not wait_tpu():
            print("TPU never recovered; aborting", flush=True)
            return
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", STAGE_SRC, str(n), str(frames),
             str(kcap), str(budget), nb],
            capture_output=True, text=True, timeout=budget + 120)
        out = (p.stdout + p.stderr).strip().splitlines()
        tail = [l for l in out if "RESULT" in l or "ALARM" in l
                or "Error" in l or "error" in l][-3:]
        print(f"{nb} n={n}: rc={p.returncode} wall={time.time()-t0:.0f}s "
              f"{' | '.join(tail) if tail else out[-1] if out else ''}",
              flush=True)


if __name__ == "__main__":
    main()
