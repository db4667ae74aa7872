"""Round-3 TPU A/B of the digit-packed int membership test
(PallasTuning.intcell), alone and composed with fuse_acc.

intcell replaces the per-chunk f32 cell decode (2 reciprocal-multiply
floors) + 3-axis |d| <= 1 membership compare (~22 VPU ops) with one int
add + three base-1024 digit tests (~9 int ops) on a bit-packed cell id.
Gating is bit-identical (tests/test_pallas.py::test_intcell_membership_
bit_identical), so this is purely a speed A/B.

Usage: python scripts/probe_intcell_tpu.py [stage-filter-substring]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_compact_tpu import BENCH_SRC, wait_tpu  # noqa: E402

IC = {"SPH_PALLAS_INTCELL": "1"}
ICF = {"SPH_PALLAS_INTCELL": "1", "SPH_PALLAS_FACC": "1"}


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    stages = [
        ("ic_262k", IC, 1 << 18, 20, 2700),
        ("icfacc_262k", ICF, 1 << 18, 20, 2700),
        ("ic_1m", IC, 1 << 20, 20, 3000),
        ("icfacc_1m", ICF, 1 << 20, 20, 3000),
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
