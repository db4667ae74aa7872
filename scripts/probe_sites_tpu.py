"""Probe the sites backend on the tunneled TPU at increasing sizes.

Prints one line per (n, kcap) config with steady-state throughput, so a
crash loses nothing. Waits for TPU worker recovery between configs.
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def wait_tpu(max_wait=600):
    import jax
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            d = jax.devices()
            jax.block_until_ready(jax.numpy.zeros(8) + 1)
            return d
        except Exception as e:  # noqa: BLE001
            print(f"  waiting for TPU: {type(e).__name__}", flush=True)
            time.sleep(30)
    raise RuntimeError("TPU did not recover")


def main():
    import jax
    import jax.numpy as jnp
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
    from sphfluidsimulation_tpu.bench import run_bench

    enable_compilation_cache()
    wait_tpu()
    print("TPU up:", jax.devices(), flush=True)

    for n, frames, kcap in ((1 << 16, 20, 16),
                            (1 << 18, 20, 16),
                            (1 << 20, 10, 12),
                            (1 << 20, 20, 16)):
        try:
            t0 = time.time()
            r = run_bench(n_particles=n, frames=frames, neighbor="sites",
                          site_capacity=kcap)
            print(f"n={n} kcap={kcap}: {r['value']:.3e} {r['unit']} "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"n={n} kcap={kcap}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            wait_tpu()


if __name__ == "__main__":
    main()
