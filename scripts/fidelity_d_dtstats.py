#!/usr/bin/env python
"""FIDELITY Part D(c): condense dt-scaled f64 oracle trajectories to
per-frame speed statistics.

The dt/5 and dt/25 oracle runs store full (frames, N, 3) float64
pos/vel — ~63/315 MB, too heavy to commit. The dt-sensitivity claim
only needs the speed distribution per frame, so this writes
examples/fidelity_d/oracle_dtstats.npz with, for each available
dt-scale: max / p99.9 / p99 / median particle speed and the exploding
fraction (|v| > 10) per frame. Prints the table it saves.

Usage: python scripts/fidelity_d_dtstats.py [path ...]
  (defaults to examples/fidelity_d/oracle{,_dt5,_dt25}_65k.npz)
"""

import os
import sys

import numpy as np

D = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples", "fidelity_d")


def stats(path):
    d = np.load(path)
    v = d["vel"]
    speed = np.sqrt((v * v).sum(-1))          # (frames, N)
    return {
        "dt_scale": int(d["dt_scale"]) if "dt_scale" in d.files else 1,
        "frames": v.shape[0],
        "max_v": speed.max(1),
        "p999_v": np.percentile(speed, 99.9, axis=1),
        "p99_v": np.percentile(speed, 99, axis=1),
        "median_v": np.median(speed, axis=1),
        "frac_exploding": (speed > 10.0).mean(1),
    }


def main() -> int:
    paths = sys.argv[1:] or [
        os.path.join(D, n) for n in
        ("oracle_65k.npz", "oracle_dt5_65k.npz", "oracle_dt25_65k.npz")]
    out = {}
    for p in paths:
        if not os.path.exists(p):
            print(f"skip (missing): {p}")
            continue
        s = stats(p)
        tag = f"dt{s['dt_scale']}"
        for k in ("max_v", "p999_v", "p99_v", "median_v",
                  "frac_exploding"):
            out[f"{tag}_{k}"] = s[k]
        print(f"{tag}: {s['frames']} frames "
              f"(substep dt = reference dt / {s['dt_scale']})")
        for fr in range(s["frames"]):
            print(f"  frame {fr + 1:2d}: max_v={s['max_v'][fr]:.3e} "
                  f"p99.9={s['p999_v'][fr]:.3e} p99={s['p99_v'][fr]:.3e} "
                  f"median={s['median_v'][fr]:.3e} "
                  f"exploding(>10)={s['frac_exploding'][fr]:.4f}")
    if not out:
        return 2
    dst = os.path.join(D, "oracle_dtstats.npz")
    np.savez_compressed(dst, **out)
    print(f"saved {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
