"""Round-3 TPU sweep: v6 row-tile height (SPH_PALLAS_ROWS).

Hypothesis (BENCH_NOTES round-3): the force kernel is Mosaic
scalar-core bound at ~340 ns per chunk iteration regardless of tile
height, so taller row-tiles (128/256) hide the scalar core behind a
proportionally larger VPU pair block and cut chunk-iterations-per-
particle 2-3x. Groups stay at 1024 particles (same window DMA bases).

Usage: python scripts/probe_rows_tpu.py [stage-filter-substring]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_compact_tpu import BENCH_SRC, wait_tpu  # noqa: E402


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    stages = [
        ("rows128_262k", {"SPH_PALLAS_ROWS": "128", "SPH_PALLAS_TPG": "8"},
         1 << 18, 20, 2700),
        ("rows256_262k", {"SPH_PALLAS_ROWS": "256", "SPH_PALLAS_TPG": "4"},
         1 << 18, 20, 2700),
        ("rows256u2_262k", {"SPH_PALLAS_ROWS": "256", "SPH_PALLAS_TPG": "4",
                            "SPH_PALLAS_UNROLL": "2"}, 1 << 18, 20, 2700),
        ("rows512_262k", {"SPH_PALLAS_ROWS": "512", "SPH_PALLAS_TPG": "2"},
         1 << 18, 20, 2700),
        ("rows256_1m", {"SPH_PALLAS_ROWS": "256", "SPH_PALLAS_TPG": "4"},
         1 << 20, 20, 3000),
        ("rows128_1m", {"SPH_PALLAS_ROWS": "128", "SPH_PALLAS_TPG": "8"},
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
