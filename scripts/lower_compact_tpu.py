#!/usr/bin/env python
"""Host-side Mosaic lowering check for the v7 compact kernel.

``jax.jit(...).lower(...)`` against the TPU target runs Mosaic's block-
mapping validation (the last-two-dims 8/128 rule etc.) WITHOUT touching
the device — a failed compile on the real worker costs a ~40-min crash
recovery, a failed lower here costs seconds. Lowers the compact frame
step at 16k and 262k shapes plus the r16/r64 row-tile variants.

Exits via os._exit (tunneled-worker teardown crash — BENCH_NOTES.md).
"""

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def on_alarm(*a):
    print("ALARM: timed out", flush=True)
    os._exit(9)


signal.signal(signal.SIGALRM, on_alarm)
signal.alarm(900)

import jax  # noqa: E402

from sphfluidsimulation_tpu.bench import scaled_config  # noqa: E402
from sphfluidsimulation_tpu.params import PhysParams  # noqa: E402
from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning  # noqa: E402
from sphfluidsimulation_tpu.sim.stepper import (  # noqa: E402
    initial_state, make_param_step)


def main() -> int:
    rc = 0
    cases = [
        ("v7", 1 << 14, dict(compact=True)),
        ("v7", 1 << 18, dict(compact=True)),
        ("v7-r16", 1 << 18, dict(compact=True, compact_rows=16)),
        ("v7-r64", 1 << 18, dict(compact=True, compact_rows=64)),
        # v6 (4-field density window) + the bf16 pair-packed variants
        ("v6", 1 << 14, dict(compact=False)),
        ("v6-bf16", 1 << 14, dict(compact=False, bf16=True)),
        ("v7-bf16", 1 << 14, dict(compact=True, bf16=True)),
    ]
    for name, n, kw in cases:
        cfg = scaled_config(n)
        st = initial_state(cfg)
        phys = PhysParams.from_config(cfg)
        tune = PallasTuning(fused=True, **kw)
        try:
            jax.jit(make_param_step(cfg, neighbor="pallas",
                                    pallas_tune=tune)).lower(st, phys)
            print(f"{name} n={n}: lower OK", flush=True)
        except Exception as e:  # noqa: BLE001 — report every config
            rc = 1
            print(f"{name} n={n}: LOWER FAILED\n"
                  + "\n".join(str(e).splitlines()[:6]), flush=True)
    return rc


if __name__ == "__main__":
    r = main()
    sys.stdout.flush()
    os._exit(r)
