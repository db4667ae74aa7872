"""Frame cost vs rollout depth at 1M (pallas): the per-pass replica on a
frame-100 state prices the frame at ~315 ms, while run_bench (timed over
frames 25-45) recorded ~464 ms — is there a mid-collapse cost hump, or a
bench-methodology artifact? One 10-frame scan program, dispatched
repeatedly; each chunk timed with one device sync.

Usage: python scripts/probe_framecost_tpu.py [log2_n] [n_chunks]
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
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg = scaled_config(1 << log2_n)
    roll = make_rollout(cfg, 10, neighbor="pallas", scan_unroll=True)
    st = initial_state(cfg)
    st, m = roll(st)   # compile + frames 0-10
    device_sync(st.pos)
    print("compiled", flush=True)
    frame = 10
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        st, m = roll(st)
        device_sync(st.pos)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        frame += 10
        print(f"frames {frame-10}-{frame}: {dt:.1f} ms/frame "
              f"(max_speed={float(jnp.max(m.max_speed)):.3g})", flush=True)
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
