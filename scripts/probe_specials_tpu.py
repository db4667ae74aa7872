"""Do inf/NaN lanes throttle the v5e VPU pair math? The violent golden EOS
fills velocities/densities with specials as the rollout deepens; if
sqrt/rsqrt/mul on specials run below rate, that explains the monotonic
frame-cost growth (466->615 ms over 130 frames) and the same-state-replica
discount. Times fused_substep (independent re-runs, scalar seed) on the
same evolved frame with 0%/10%/50% of velocity lanes forced to inf and
rho to inf on those lanes.

Usage: python scripts/probe_specials_tpu.py [log2_n]
"""
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")
ITER = 20


def main():
    signal.signal(signal.SIGALRM, lambda *a: os._exit(9))
    signal.alarm(2800)

    import jax
    import jax.numpy as jnp
    from sphfluidsimulation_tpu.bench import scaled_config
    from sphfluidsimulation_tpu.ops import pallas_sph as ps
    from sphfluidsimulation_tpu.params import PhysParams
    from sphfluidsimulation_tpu.sim.stepper import initial_state
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    float(jnp.sum(jnp.ones(8)))
    print("TPU up", flush=True)

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = scaled_config(1 << log2_n)
    r, n = cfg.bucket_resolution, cfg.n_particles
    phys = PhysParams.from_config(cfg)
    tune = ps.default_tuning()
    st = initial_state(cfg)

    frame, (pos_s, vel_s) = jax.jit(
        lambda p: ps.build_frame(p, r, cfg.voxel_capacity,
                                 extras=(p, jnp.zeros_like(p))))(st.pos)
    rho_s = jax.jit(lambda f, p: ps.density_pallas(f, p, phys, r, n))(
        frame, pos_s)

    def timed(name, rows):
        def body(c, _):
            out, _ = ps.fused_substep(frame, rows + c * 1e-30, phys, r, n,
                                      tune=tune)
            # nan-safe reduce: sum of finite lanes only, so the seed chain
            # never poisons (where-select keeps the data dependence)
            fin = jnp.where(jnp.isfinite(out), out, 0.0)
            return jnp.sum(fin) * 1e-30, None

        f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                         length=ITER)[0])
        float(f())
        t0 = time.perf_counter()
        float(f())
        dt = (time.perf_counter() - t0) / ITER * 1e3
        print(f"{name}: {dt:.2f} ms/substep", flush=True)

    def contaminated(frac):
        rows = ps.pack_rows(pos_s, vel_s, rho_s, None, n, tune)
        if frac == 0.0:
            return jax.jit(lambda: rows)()
        npad = ps.padded_n(n, tune)
        r2 = rows.reshape(npad, ps.N_FIELDS)
        lane = jnp.arange(npad) % 100 < int(frac * 100)
        inf = jnp.float32(jnp.inf)
        for col in (3, 4, 5, 6):  # vx, vy, vz, rho
            r2 = r2.at[:, col].set(jnp.where(lane, inf, r2[:, col]))
        return jax.jit(lambda x: x.reshape(rows.shape))(r2)

    for frac in (0.0, 0.1, 0.5, 0.0):
        timed(f"specials {int(frac*100):3d}%", contaminated(frac))
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
