#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

Measures particle-substeps/sec/chip on the canonical dam-break (the
reference's only shipped workload, scaled per BASELINE.md). Falls back to
smaller particle counts if the large config cannot run (the tunneled TPU
worker has limited memory/stability), and always prints a single JSON line.
"""

import json
import os
import signal
import sys
import time
import traceback


class _StageTimeout(Exception):
    pass


def _arm(seconds: int) -> None:
    """In-flight axon dispatches hang forever when the TPU worker crashes;
    an alarm turns the hang into a fallback."""
    def on_alarm(*a):
        raise _StageTimeout("stage timed out")

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def _wait_tpu_recovery(max_wait: float = 2400.0) -> None:
    """After a 'TPU worker process crashed', the tunnel needs up to ~40
    minutes to recover; retry until the device answers.

    Ready == a FRESH (cache-busted) Mosaic compile succeeds: plain
    dispatches recover well before the remote tpu_compile_helper fleet
    does, and a broken helper 500s every real pallas compile while
    ``jnp.sum`` happily runs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t0 = time.time()
    attempt = 0
    while time.time() - t0 < max_wait:
        try:
            _arm(240)
            c = jnp.float32((int(time.time()) % 100000) + attempt)

            def _k(x_ref, o_ref, c=c):
                o_ref[...] = x_ref[...] + c

            f = pl.pallas_call(_k, out_shape=jax.ShapeDtypeStruct(
                (8, 128), jnp.float32))
            y = float(jnp.sum(f(jnp.ones((8, 128), jnp.float32))))
            signal.alarm(0)
            assert y == y  # finite dispatch completed
            return
        except Exception:  # noqa: BLE001
            signal.alarm(0)
            attempt += 1
            time.sleep(30)


def main() -> int:
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from sphfluidsimulation_tpu.bench import run_bench
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    last_err = None
    _wait_tpu_recovery()  # a previous driver step may have crashed the worker
    for n, frames, neighbor, kcap, budget in (
            (1 << 20, 20, "pallas", None, 1800),
            (1 << 18, 20, "pallas", None, 1200),
            (1 << 18, 20, "sites", 16, 1200),
            (1 << 16, 30, "slotted", None, 1200)):
        try:
            _arm(budget)
            result = run_bench(n_particles=n, frames=frames,
                               neighbor=neighbor, site_capacity=kcap)
            signal.alarm(0)
            print(json.dumps(result), flush=True)
            os._exit(0)  # skip axon teardown (can crash the TPU worker)
        except Exception as e:  # noqa: BLE001 — must always emit one line
            signal.alarm(0)
            last_err = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)
            _wait_tpu_recovery()

    print(json.dumps({
        "metric": "particle-substeps/sec/chip (dam-break, faithful mode)",
        "value": 0.0,
        "unit": "particle-substeps/s",
        "vs_baseline": 0.0,
        "error": last_err,
    }), flush=True)
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
