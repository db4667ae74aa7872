"""Is the frames-scan 'anomaly' just per-sync tunnel latency? Measures
(a) device_sync round-trip on an already-ready array, (b) roll10 per-frame
cost with one sync per chunk vs one sync per 3 chunks, (c) the same-state
replica, all in one process at the same rollout depth.

Usage: python scripts/probe_sync_tpu.py [log2_n] [evolve]
"""
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    signal.signal(signal.SIGALRM, lambda *a: os._exit(9))
    signal.alarm(3000)

    import jax
    import jax.numpy as jnp
    from sphfluidsimulation_tpu.bench import scaled_config
    from sphfluidsimulation_tpu.sim.stepper import initial_state, make_rollout
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
    from sphfluidsimulation_tpu.utils.profiling import device_sync

    enable_compilation_cache()
    float(jnp.sum(jnp.ones(8)))
    print("TPU up", flush=True)

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    evolve = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cfg = scaled_config(1 << log2_n)
    roll10 = make_rollout(cfg, 10, neighbor="pallas", scan_unroll=True)
    st = initial_state(cfg)
    for _ in range(evolve // 10):
        st, _ = roll10(st)
    device_sync(st.pos)
    print(f"evolved {evolve}", flush=True)

    # (a) sync round-trip on ready data
    for i in range(3):
        t0 = time.perf_counter()
        device_sync(st.pos)
        print(f"sync ready pos: {(time.perf_counter()-t0)*1e3:.0f} ms",
              flush=True)

    # (b) chunk timing, sync per chunk vs per 3 chunks
    s = st
    t0 = time.perf_counter()
    s, _ = roll10(s)
    device_sync(s.pos)
    print(f"roll10 sync-each: {(time.perf_counter()-t0)/10*1e3:.1f} "
          "ms/frame", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        s, _ = roll10(s)
    device_sync(s.pos)
    print(f"roll10 x3 one sync: {(time.perf_counter()-t0)/30*1e3:.1f} "
          "ms/frame", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        s, _ = roll10(s)
    device_sync(s.pos)
    print(f"roll10 x3 one sync (rep): {(time.perf_counter()-t0)/30*1e3:.1f} "
          "ms/frame", flush=True)
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
