"""Pallas v6 TPU ladder, all stages in ONE process, exiting via os._exit
to skip the axon-plugin teardown that crashes the TPU worker.

Per-stage SIGALRM watchdog: on timeout we print and _exit immediately
(results so far are already flushed).
"""
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    def on_alarm(*a):
        print("ALARM: stage timed out; exiting", flush=True)
        os._exit(9)

    signal.signal(signal.SIGALRM, on_alarm)

    import jax.numpy as jnp
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
    from sphfluidsimulation_tpu.bench import run_bench

    enable_compilation_cache()
    signal.alarm(120)
    float(jnp.sum(jnp.ones(8)))
    print("TPU up", flush=True)

    stages = [
        ("pallas-1M", dict(n_particles=1 << 20, frames=20,
                           neighbor="pallas"), 1500),
        ("pallas-262k-again", dict(n_particles=1 << 18, frames=20,
                                   neighbor="pallas"), 600),
    ]
    for name, kw, budget in stages:
        signal.alarm(budget)
        t0 = time.time()
        try:
            r = run_bench(**kw)
            print(f"{name}: {r['value']:.4g} ps/s compile="
                  f"{r['compile_plus_warmup_s']}s elapsed={r['elapsed_s']}s "
                  f"cert={r['exact_cert_total']} ovf={r['overflow_max']} "
                  f"wall={time.time()-t0:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            break
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
