"""Validate a pallas-kernel layout change on the REAL TPU:

1. correctness — calm-1024 pallas 100-frame rollout must match the
   brute-oracle pin (tests/data/calm1024_pin_r2.npz, f100) to float
   rounding (RMSE < 1e-7), certificate 0;
2. throughput — 262k golden bench number printed for comparison.

One process, alarm watchdogs, os._exit.
"""
import os
import signal
import sys

sys.path.insert(0, "/root/repo")


def main():
    def on_alarm(*a):
        print("ALARM", flush=True)
        os._exit(9)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(1800)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sphfluidsimulation_tpu.config import SimConfig
    from sphfluidsimulation_tpu.sim.stepper import initial_state, make_rollout
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    float(jnp.sum(jnp.ones(8)))
    print("TPU up", flush=True)

    calm = SimConfig(particle_number=1024, bucket_resolution=11, preset=0,
                     gas_constant=20.0, rest_density=1.7, viscosity=0.05,
                     stiffness_coefficient=1000.0, frame_dt=1 / 240)
    st = initial_state(calm)
    final, m = make_rollout(calm, 100, neighbor="pallas")(st)
    jax.block_until_ready(final.pos)
    pin = np.load("/root/repo/tests/data/calm1024_pin_r2.npz")["f100"]
    rmse = float(np.sqrt(np.mean((np.asarray(final.pos) - pin) ** 2)))
    cert = int(jnp.sum(m.exact_cert))
    print(f"calm100 rmse_vs_brute_pin={rmse:.3e} cert={cert}", flush=True)
    ok = rmse < 1e-7 and cert == 0
    print("CORRECTNESS", "PASS" if ok else "FAIL", flush=True)

    signal.alarm(1500)
    from sphfluidsimulation_tpu.bench import run_bench
    r = run_bench(n_particles=1 << 18, frames=20, neighbor="pallas")
    print(f"262k: {r['value']:.4g} ps/s elapsed={r['elapsed_s']}s "
          f"cert={r['exact_cert_total']}", flush=True)
    os._exit(0 if ok else 7)


if __name__ == "__main__":
    main()
