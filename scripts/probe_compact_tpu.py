"""Round-3 TPU probe for the v7 compact-lane kernel: compiled correctness
vs v6 at 16k, then throughput at 262k/1M with row-tile sweeps.

Subprocess-per-stage with SIGALRM watchdogs and os._exit (normal
interpreter teardown can crash the tunneled TPU worker), TPU recovery
polling between stages.

Usage: python scripts/probe_compact_tpu.py [stage-filter-substring]
"""
import os
import subprocess
import sys
import time

RETRY_SRC = r"""
def _retry(f, tries=8, wait=25):
    # The remote tpu_compile_helper fleet 500s INDIVIDUAL requests while
    # (re)initializing after a worker crash; successfully compiled Mosaic
    # kernels are cached in-process, so retrying the same jit call
    # accumulates progress until every kernel got a healthy helper.
    import time as _t
    for t in range(tries):
        try:
            return f()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "remote_compile" not in msg and "Mosaic" not in msg:
                raise
            print(f"  compile retry {t}: {msg[:90]}", flush=True)
            _t.sleep(wait)
    raise RuntimeError("compile retries exhausted")
"""

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
t6 = PallasTuning(fused=True, compact=False)
t7 = t6._replace(compact=True)
s6, m6 = _retry(lambda: jax.jit(make_param_step(
    cfg, neighbor="pallas", pallas_tune=t6))(st, phys))
p6 = np.asarray(s6.pos); v6v = np.asarray(s6.vel)
s7, m7 = _retry(lambda: jax.jit(make_param_step(
    cfg, neighbor="pallas", pallas_tune=t7))(st, phys))
p7 = np.asarray(s7.pos); v7v = np.asarray(s7.vel)
dp = np.abs(p7 - p6).max(); dv = np.abs(v7v - v6v).max()
print(f"RESULT dpos={dp:.3e} dvel={dv:.3e} cert6={int(m6.exact_cert)} "
      f"cert7={int(m7.exact_cert)} rho={float(m7.mean_density):.6f}",
      flush=True)
os._exit(0)
"""

BENCH_SRC = RETRY_SRC + r"""
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

import jax, jax.numpy as jnp
from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
from sphfluidsimulation_tpu.bench import run_bench
enable_compilation_cache()
float(jnp.sum(jnp.ones(8)))
n, frames = int(sys.argv[1]), int(sys.argv[3])
r = _retry(lambda: run_bench(n_particles=n, frames=frames,
                             neighbor="pallas"))
print(f"RESULT {r['value']:.4g} {r['unit']} compile={r['compile_plus_warmup_s']}s "
      f"cert={r['exact_cert_total']} ovf={r['overflow_max']} "
      f"tune={r['pallas_tuning']}", flush=True)
os._exit(0)
"""


def wait_tpu(max_wait=2700):
    """Ready == a FRESH Mosaic compile succeeds (not just a dispatch: the
    remote tpu_compile_helper recovers long after dispatch does, and its
    broken state 500s every pallas compile)."""
    probe = (
        "import signal,sys,os;signal.alarm(240)\n"
        "import jax,jax.numpy as jnp\n"
        "from jax.experimental import pallas as pl\n"
        "import time\n"
        "c = float(int(time.time()) % 100000)  # cache-bust constant\n"
        "def k(x_ref, o_ref):\n"
        "    o_ref[...] = x_ref[...] + c\n"
        "f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128),"
        " jnp.float32))\n"
        "y = float(jnp.sum(f(jnp.ones((8, 128), jnp.float32))))\n"
        "assert abs(y - (1 + c) * 8 * 128) < 1e-3, y\n"
        "print('up', flush=True); os._exit(0)\n")
    t0 = time.time()
    while time.time() - t0 < max_wait:
        rc = subprocess.run([sys.executable, "-c", probe],
                            capture_output=True, text=True, timeout=300)
        if rc.returncode == 0 and "up" in rc.stdout:
            return True
        tail = (rc.stdout + rc.stderr).strip().splitlines()
        tail = tail[-1][:120] if tail else ""
        print(f"  tpu not ready (rc={rc.returncode}) {tail}", flush=True)
        time.sleep(45)
    return False


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    C = {"SPH_PALLAS_COMPACT": "1"}
    stages = [
        ("check_16k", CHECK_SRC, {}, 1 << 14, 20, 2400),
        ("compact_262k_r32", BENCH_SRC, C, 1 << 18, 20, 2700),
        ("compact_262k_r16", BENCH_SRC,
         {**C, "SPH_PALLAS_CROWS": "16"}, 1 << 18, 20, 2700),
        ("compact_262k_r64", BENCH_SRC,
         {**C, "SPH_PALLAS_CROWS": "64"}, 1 << 18, 20, 2700),
        ("compact_1m_r32", BENCH_SRC, C, 1 << 20, 20, 3000),
        ("v6bf16_262k", BENCH_SRC, {"SPH_PALLAS_BF16": "1"},
         1 << 18, 20, 2700),
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
            # broken-helper 500s can outlive the dispatch recovery; give
            # the server fleet time before burning another attempt
            time.sleep(180)


if __name__ == "__main__":
    main()
