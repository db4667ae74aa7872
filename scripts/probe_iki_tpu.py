"""Round-3 TPU validation + bench of the v9 in-kernel worklist (iki).

check_16k: compiled iki vs flat must be BIT-identical (the worklists are
identical integers, so even on the explosive golden config the floats
match exactly). Then throughput at 262k/1M.

Usage: python scripts/probe_iki_tpu.py [stage-filter]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_compact_tpu import BENCH_SRC, RETRY_SRC, wait_tpu  # noqa: E402

CHECK_SRC = RETRY_SRC + r"""
import sys as _s, os as _o
_s.excepthook = lambda *a: (_s.__excepthook__(*a), _s.stdout.flush(),
                            _o._exit(1))
import os, signal, sys
sys.path.insert(0, "/root/repo")

def on_alarm(*a):
    print("ALARM: stage timed out", flush=True)
    os._exit(9)

signal.signal(signal.SIGALRM, on_alarm)
signal.alarm(int(sys.argv[2]))

import numpy as np
import jax, jax.numpy as jnp
from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
from sphfluidsimulation_tpu.config import SimConfig
from sphfluidsimulation_tpu.params import PhysParams
from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
from sphfluidsimulation_tpu.sim.stepper import initial_state, make_param_step
enable_compilation_cache()
float(jnp.sum(jnp.ones(8)))

n = int(sys.argv[1])
cfg = SimConfig(particle_number=n, bucket_resolution=19 if n <= 1 << 14
                else 30)
st = initial_state(cfg)
phys = PhysParams.from_config(cfg)
outs = {}
for iki in (False, True):
    t = PallasTuning(fused=True, flat=True, iki=iki)
    s, m = _retry(lambda: jax.jit(make_param_step(
        cfg, neighbor="pallas", pallas_tune=t))(st, phys))
    outs[iki] = (np.asarray(s.pos), np.asarray(s.vel), int(m.exact_cert))
dp = np.abs(outs[True][0] - outs[False][0]).max()
dv = np.abs(outs[True][1] - outs[False][1]).max()
print(f"RESULT dpos={dp:.3e} dvel={dv:.3e} "
      f"cert_flat={outs[False][2]} cert_iki={outs[True][2]}", flush=True)
os._exit(0)
"""


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    I = {"SPH_PALLAS_IKI": "1"}
    stages = [
        ("check_16k", CHECK_SRC, {}, 1 << 14, 20, 2400),
        ("iki_262k", BENCH_SRC, I, 1 << 18, 20, 2700),
        ("iki_1m", BENCH_SRC, I, 1 << 20, 20, 3000),
    ]
    for name, src, env_over, n, frames, budget in stages:
        if filt and filt not in name:
            continue
        env = dict(os.environ)
        env.update(env_over)
        for attempt in range(2):
            if not wait_tpu():
                print("TPU never recovered; aborting", flush=True)
                return
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, "-c", src, str(n), str(budget),
                 str(frames)],
                capture_output=True, text=True, timeout=budget + 120,
                env=env)
            out = (p.stdout + p.stderr).strip().splitlines()
            tail = [l for l in out if "RESULT" in l or "ALARM" in l
                    or "Error" in l][-2:]
            print(f"{name} n={n} try{attempt}: rc={p.returncode} "
                  f"wall={time.time()-t0:.0f}s "
                  f"{' | '.join(tail) if tail else (out[-1] if out else '')}",
                  flush=True)
            if p.returncode == 0:
                break
            time.sleep(180)


if __name__ == "__main__":
    main()
