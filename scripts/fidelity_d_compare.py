#!/usr/bin/env python
"""FIDELITY Part D: compare f32 backend trajectories to the f64 oracle.

Reads examples/fidelity_d/{oracle_65k,pallas_65k,slotted_65k,sites_65k}.npz
(whichever exist) and prints, per frame 1-5:

  * RMSE(backend_f32, oracle_f64)     — total error incl. f32 rounding
  * RMSE(backend_a, backend_b)        — pure summation-order spread between
                                        two f32 implementations
  * fraction of particles within 1e-3 / 1e-1 of the oracle

If backend-vs-oracle error is the same magnitude as backend-vs-backend
spread, the divergence is f32 rounding amplified by the (physically
exploding — see oracle max_v ~1e24 in FLOAT64) golden dynamics, not an
implementation error. CPU-only, no TPU needed.
"""

import os
import sys

import numpy as np

D = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples", "fidelity_d")


def load(name):
    p = os.path.join(D, f"{name}_65k.npz")
    return np.load(p) if os.path.exists(p) else None


def rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


def main() -> int:
    oracle = load("oracle")
    if oracle is None:
        print("no oracle npz; run scripts/fidelity_d_oracle.py first")
        return 2
    opos = oracle["pos"]
    backends = {k: v for k, v in
                ((n, load(n)) for n in ("pallas", "pallas-kahan",
                                        "pallas-exact", "slotted", "sites"))
                if v is not None}
    if not backends:
        print("no backend trajectories; run scripts/fidelity_d_tpu.py")
        return 2

    names = sorted(backends)
    print(f"oracle: f64, {opos.shape[1]} particles, "
          f"{opos.shape[0]} frames (max_v at frame 1 ~1e24: the golden "
          f"EOS explodes in float64 too)")
    hdr = "frame  " + "  ".join(f"{n}-vs-f64" for n in names)
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    hdr += "  " + "  ".join(f"{a}-vs-{b}" for a, b in pairs)
    print(hdr)
    for fr in range(opos.shape[0]):
        row = [f"{fr + 1:5d}"]
        for n in names:
            row.append(f"{rmse(backends[n]['pos'][fr], opos[fr]):11.4e}")
        for a, b in pairs:
            row.append(
                f"{rmse(backends[a]['pos'][fr], backends[b]['pos'][fr]):11.4e}")
        print("  ".join(row))

    for n in names:
        close = np.abs(backends[n]["pos"][0] - opos[0]).max(-1)
        print(f"{n}: frame-1 particles within 1e-3 of f64 oracle: "
              f"{float((close < 1e-3).mean()):.3f}, within 1e-1: "
              f"{float((close < 1e-1).mean()):.3f}")

    # calm-subset: particles whose ORACLE velocity stays < 10 over all
    # frames (excludes the exploding tail the EOS itself produces) — the
    # error a non-exploding particle accumulates in f32
    ovel = oracle["vel"]
    calm = (np.abs(ovel).max(axis=(0, 2)) < 10.0)
    print(f"calm subset (oracle |v| < 10 all frames): "
          f"{float(calm.mean()):.3f} of particles")
    for n in names:
        row = [f"{n} calm-RMSE/frame:"]
        for fr in range(opos.shape[0]):
            row.append(f"{rmse(backends[n]['pos'][fr][calm], opos[fr][calm]):.3e}")
        print("  ".join(row))

    # NaN-aware view: positions go NaN FAITHFULLY on this flow (inf
    # velocity + -inf acceleration passes the reference's
    # isnan(acc)-only trap, VelPos.compute:143-150), which poisons the
    # whole-array RMSE above from the first NaN frame. Restrict to
    # particles finite in BOTH trajectories and report the NaN fraction.
    print("\nfinite-subset view (frame: nan-frac, finite-RMSE vs f64,"
          " finite-calm-RMSE):")
    for n in names:
        rows = [n]
        for fr in range(opos.shape[0]):
            bp = backends[n]["pos"][fr]
            fin = (np.isfinite(bp).all(-1) & np.isfinite(opos[fr]).all(-1))
            nanfrac = 1.0 - float(fin.mean())
            fr_rmse = rmse(bp[fin], opos[fr][fin]) if fin.any() else float("nan")
            fc = fin & calm
            fc_rmse = rmse(bp[fc], opos[fr][fc]) if fc.any() else float("nan")
            rows.append(f"f{fr + 1}: {nanfrac:.3f} {fr_rmse:.3e} "
                        f"{fc_rmse:.3e}")
        print("  ".join(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
