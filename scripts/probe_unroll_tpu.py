"""A/B: unrolling the 5-substep scan (SPH_SCAN_UNROLL) at 262k/1M."""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_compact_tpu import BENCH_SRC, wait_tpu  # noqa: E402


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    stages = [
        ("unr_262k", {"SPH_SCAN_UNROLL": "1"}, 1 << 18, 20, 2700),
        ("base_262k", {}, 1 << 18, 20, 2700),
        ("unr_1m", {"SPH_SCAN_UNROLL": "1"}, 1 << 20, 20, 3000),
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
