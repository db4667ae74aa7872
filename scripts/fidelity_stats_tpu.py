#!/usr/bin/env python
"""FIDELITY statistics-level comparison (VERDICT round-2 item 3b).

Chaotic flows make positional RMSE between backends meaningless past a
few frames at golden scale (overflow coin-flips, Parts C/D). The
well-posed cross-backend question is STATISTICAL: do the flows' summary
traces — mean density, kinetic energy, max speed, NaN-trap and overflow
counts per frame — agree over 1000 frames? If two backends with
different summation orders produce statistically matching traces, they
simulate the same fluid.

Legs (argv[1]): 'pallas' | 'slotted' — 1000 frames @262k golden on the
TPU, per-frame StepMetrics traces saved to examples/fidelity_stats/.
'compare' (CPU) prints the trace agreement table for FIDELITY.md.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "compare"
if MODE == "compare":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "fidelity_stats")
N_FRAMES = 1000
CHUNK = 20


def on_alarm(*a):
    print("ALARM: timed out", flush=True)
    os._exit(9)


def run_leg(neighbor: str) -> int:
    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(5400)
    import numpy as np
    import jax
    from sphfluidsimulation_tpu.config import SimConfig
    from sphfluidsimulation_tpu.sim.stepper import initial_state, make_rollout
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    golden = SimConfig(particle_number=262144, bucket_resolution=47,
                       site_capacity=24)
    st = initial_state(golden)
    roll = make_rollout(golden, CHUNK, neighbor=neighbor)
    traces = {k: [] for k in ("mean_density", "kinetic_energy",
                              "max_speed", "nan_events", "overflow",
                              "exact_cert")}
    t0 = time.time()
    for c in range(N_FRAMES // CHUNK):
        st, m = roll(st)
        jax.block_until_ready(st.pos)
        for k in traces:
            traces[k].append(np.asarray(getattr(m, k)))
        if c % 10 == 9:
            print(f"  {neighbor}: {(c + 1) * CHUNK} frames, "
                  f"{time.time() - t0:.0f}s", flush=True)
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{neighbor}_262k_traces.npz")
    np.savez_compressed(
        path, **{k: np.concatenate(v) for k, v in traces.items()})
    print(f"saved {path} ({time.time() - t0:.0f}s)", flush=True)
    return 0


def compare() -> int:
    import numpy as np

    legs = {}
    for nb in ("pallas", "slotted", "sites"):
        p = os.path.join(OUT, f"{nb}_262k_traces.npz")
        if os.path.exists(p):
            legs[nb] = np.load(p)
    if len(legs) < 2:
        print("need >= 2 trace files; run the legs first")
        return 2
    names = sorted(legs)
    base = names[0]
    windows = [(0, 100), (100, 300), (300, 1000)]
    print("windowed mean traces (relative gap vs "
          f"{base}) over 1000 frames @262k golden:")
    for key in ("mean_density", "kinetic_energy", "max_speed"):
        for lo, hi in windows:
            row = [f"{key}[{lo}:{hi}]"]
            ref = np.nanmean(np.where(np.isfinite(legs[base][key][lo:hi]),
                                      legs[base][key][lo:hi], np.nan))
            for nb in names:
                tr = legs[nb][key][lo:hi]
                v = np.nanmean(np.where(np.isfinite(tr), tr, np.nan))
                gap = abs(v - ref) / max(abs(ref), 1e-30)
                row.append(f"{nb}={v:.4g} (gap {gap:.2%})")
            print("  " + "  ".join(row), flush=True)
    for key in ("nan_events", "overflow", "exact_cert"):
        row = [f"{key} total"]
        for nb in names:
            row.append(f"{nb}={int(legs[nb][key].sum())}")
        print("  " + "  ".join(row), flush=True)
    # finite fraction of the KE trace (inf KE frames = exploded states)
    for nb in names:
        ke = legs[nb]["kinetic_energy"]
        print(f"  {nb}: KE finite-frame fraction "
              f"{float(np.isfinite(ke).mean()):.3f}", flush=True)
    return 0


def main() -> int:
    if MODE == "compare":
        return compare()
    import jax.numpy as jnp
    float(jnp.sum(jnp.ones(8)))
    rc = run_leg(MODE)
    sys.stdout.flush()
    os._exit(rc)


if __name__ == "__main__":
    sys.exit(main())
