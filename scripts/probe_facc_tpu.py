"""Round-3 TPU A/B of fused force accumulators (PallasTuning.fuse_acc).

fuse_acc folds the scalar viscosity μ into the per-pair viscosity
coefficient so pressure + viscosity share ONE accumulator triple (6 -> 3
accumulators): 3 fewer selects+adds per candidate chunk and half the
accumulator vregs. The register relief is also the enabling condition for
re-trying taller row tiles (rows=128 lost to register pressure with 6
accumulators, BENCH_NOTES round 2), so the sweep re-measures rows 64/128
under fuse_acc.

Usage: python scripts/probe_facc_tpu.py [stage-filter-substring]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_compact_tpu import BENCH_SRC, wait_tpu  # noqa: E402

F = {"SPH_PALLAS_FACC": "1"}


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    stages = [
        ("facc_262k", F, 1 << 18, 20, 2700),
        ("base_262k", {}, 1 << 18, 20, 2700),
        ("facc_r128_262k", {**F, "SPH_PALLAS_ROWS": "128",
                            "SPH_PALLAS_TPG": "8"}, 1 << 18, 20, 2700),
        ("facc_1m", F, 1 << 20, 20, 3000),
        ("base_1m", {}, 1 << 20, 20, 3000),
        ("facc_r128_1m", {**F, "SPH_PALLAS_ROWS": "128",
                          "SPH_PALLAS_TPG": "8"}, 1 << 20, 20, 3000),
        ("facc_r32_262k", {**F, "SPH_PALLAS_ROWS": "32",
                           "SPH_PALLAS_TPG": "32"}, 1 << 18, 20, 2700),
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
