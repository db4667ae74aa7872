"""Round-3 TPU A/B of precomputed j-side window values (PallasTuning.pj),
alone and composed with the fuse_acc + intcell stack.

pj moves press_j = k*(rho_j - rho0) and the guarded reciprocal
[rho>eps]/rho out of the per-(tile, chunk) pair math into a per-particle
XLA precompute riding the window as one extra field: drops a subtract, a
multiply, a compare, two selects and the full vector divide from every
candidate chunk. Tracking is ~ulp (FMA-contraction boundary moves,
tests/test_pallas.py::test_pj_precomputed_window_tracks_in_kernel).

Usage: python scripts/probe_pj_tpu.py [stage-filter-substring]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_compact_tpu import BENCH_SRC, wait_tpu  # noqa: E402

PJ = {"SPH_PALLAS_PJ": "1"}
# NOTE: intcell is deliberately NOT in the stack — compiled Mosaic
# produces wrong memberships on the v5e (see PallasTuning docstring);
# stages that measured with it on are quoted as tainted in BENCH_NOTES.
STACK = {"SPH_PALLAS_PJ": "1", "SPH_PALLAS_FACC": "1",
         "SPH_PALLAS_INTCELL": "0"}


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    stages = [
        ("pjstack_262k", STACK, 1 << 18, 20, 2700),
        ("pjonly_262k", PJ, 1 << 18, 20, 2700),
        ("pjstack_1m", STACK, 1 << 20, 20, 3000),
        ("icfacc2_1m", {"SPH_PALLAS_FACC": "1", "SPH_PALLAS_INTCELL": "1"},
         1 << 20, 20, 3000),
    ]
    for name, env_over, n, frames, budget in stages:
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
                [sys.executable, "-c", BENCH_SRC, str(n), str(budget),
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
