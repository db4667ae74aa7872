"""Round-3 sweep of unroll / tile geometry under the full op-cut stack
(fuse_acc + intcell + pj).

The stack cut per-chunk VPU math ~25% (262k: 12.02 -> 13.65M), which
raises the relative weight of the ~80 ns/chunk Mosaic scalar overhead and
lowers register pressure (3 accumulators, no in-kernel divide/decode
temporaries) — the conditions under which the earlier unroll-8 and tall-
tile losses were measured no longer hold, so re-measure.

Usage: python scripts/probe_stack_sweep_tpu.py [stage-filter-substring]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_compact_tpu import BENCH_SRC, wait_tpu  # noqa: E402

# round 4: intcell back in the stack (mul row key fixes the (R,1)
# shift miscompile; smoke passes compiled)
S = {"SPH_PALLAS_PJ": "1", "SPH_PALLAS_FACC": "1",
     "SPH_PALLAS_INTCELL": "1"}


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    stages = [
        ("u8_262k", {**S, "SPH_PALLAS_UNROLL": "8"}, 1 << 18, 20, 2700),
        ("u6_262k", {**S, "SPH_PALLAS_UNROLL": "6"}, 1 << 18, 20, 2700),
        ("r128u4_262k", {**S, "SPH_PALLAS_ROWS": "128",
                         "SPH_PALLAS_TPG": "8"}, 1 << 18, 20, 2700),
        ("u8_1m", {**S, "SPH_PALLAS_UNROLL": "8"}, 1 << 20, 20, 3000),
        ("u6_1m", {**S, "SPH_PALLAS_UNROLL": "6"}, 1 << 20, 20, 3000),
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
