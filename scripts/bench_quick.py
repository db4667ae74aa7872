#!/usr/bin/env python
"""One-stage bench runner for builder-side A/Bs.

Usage: python scripts/bench_quick.py [log2_n] [frames] [steady_frames]
Knobs ride the SPH_PALLAS_* env vars (PallasTuning.from_env).
Prints one JSON line; os._exit(0) (worker-safe teardown).
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    def on_alarm(*a):
        print(json.dumps({"error": "timeout"}), flush=True)
        os._exit(9)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(3300)
    t0 = time.time()

    from sphfluidsimulation_tpu.bench import run_bench
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    steady = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    out = run_bench(n_particles=1 << log2_n, frames=frames, warmup_frames=5,
                    neighbor="pallas", steady_frames=steady)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
