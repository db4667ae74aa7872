#!/usr/bin/env python
"""Measure BASELINE config-5 sweep throughput (VERDICT r5 item 4).

The reference's config 5 is 8 co-resident scenes × 524,288 particles
(4M total) stepped as one program. Here: `make_batched_step` (vmapped
param-step over the scene axis) wrapped in a frames-lax.scan, timed on
the tunneled v5e. Metric = scenes·N·substeps·frames / elapsed.

Usage: python scripts/probe_sweep_tpu.py [scenes] [log2_n_per_scene]
       [frames] [neighbor]
Defaults: 8 scenes × 2^19, 5 frames, slotted (the sweep tier's default).
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

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sphfluidsimulation_tpu.bench import scaled_config
    from sphfluidsimulation_tpu.parallel.batch import (
        batch_configs, make_batched_step)
    from sphfluidsimulation_tpu.params import PhysParams
    from sphfluidsimulation_tpu.sim.stepper import initial_state
    from sphfluidsimulation_tpu.utils.compcache import (
        enable_compilation_cache)
    from sphfluidsimulation_tpu.utils.profiling import device_sync

    enable_compilation_cache()
    float(jnp.sum(jnp.ones(8)))
    print("TPU up", flush=True)

    scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    log2_n = int(sys.argv[2]) if len(sys.argv) > 2 else 19
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    neighbor = sys.argv[4] if len(sys.argv) > 4 else "slotted"
    n = 1 << log2_n
    base = scaled_config(n)
    overrides = [{"rest_density": float(v), "seed": i}
                 for i, v in enumerate(np.linspace(1.0, 3.0, scenes))]
    cfgs = batch_configs(base, overrides)
    step = make_batched_step(base, neighbor=neighbor)
    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[initial_state(c) for c in cfgs])
    params = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[PhysParams.from_config(c) for c in cfgs])

    @jax.jit
    def roll(states):
        def body(st, _):
            st, m = step(st, params)
            return st, m.mean_density

        return jax.lax.scan(body, states, None, length=frames)

    t0 = time.time()
    out, rho = roll(states)
    device_sync(out.pos)
    compile_s = time.time() - t0
    print(f"compiled+warm in {compile_s:.0f}s", flush=True)
    t0 = time.time()
    out, rho = roll(states)
    device_sync(out.pos)
    dt = time.time() - t0
    thr = scenes * n * base.substeps * frames / dt
    print(json.dumps({
        "scenes": scenes, "n_per_scene": n, "total_particles": scenes * n,
        "frames": frames, "neighbor": neighbor, "r": base.bucket_resolution,
        "elapsed_s": round(dt, 2), "compile_s": round(compile_s, 1),
        "particle_substeps_per_s": round(thr, 0),
        "mean_rho_last": [round(float(x), 3) for x in rho[-1]],
    }), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
