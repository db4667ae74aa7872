"""Isolate the +17 ms/substep gap between a standalone-timed fused_substep
(59 ms @1M) and the same substep inside the rollout's 5-substep chain
(380/5 = 76 ms): is it the data DEPENDENCE (output feeds next input), the
nested-scan structure, or measurement artifact?

Variants (all one process, same workload, interleaved compile order):
  A  scan20, independent: body recomputes fused_substep(rows + seed)
  B  scan20, dependent:   carry IS the rows state (true substep chain)
  C  outer scan4 x inner scan5, dependent (the rollout's nesting)
  D  B with the certificate accumulation removed

Usage: python scripts/probe_chain_tpu.py [log2_n]
"""
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")
ITER = 20


def main():
    signal.signal(signal.SIGALRM, lambda *a: os._exit(9))
    signal.alarm(2400)

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
    state = initial_state(cfg)
    tune = ps.default_tuning()

    frame, (pos_s, vel_s) = jax.jit(
        lambda p: ps.build_frame(p, r, cfg.voxel_capacity,
                                 extras=(p, jnp.zeros_like(p))))(state.pos)
    rho_s = jax.jit(lambda f, p: ps.density_pallas(f, p, phys, r, n))(
        frame, pos_s)
    rows = jax.jit(lambda: ps.pack_rows(pos_s, vel_s, rho_s, None, n,
                                        tune))()
    jax.block_until_ready(rows)

    def timed(name, fn, n_sub):
        f = jax.jit(fn)
        float(jnp.sum(f()))
        t0 = time.perf_counter()
        float(jnp.sum(f()))
        dt = (time.perf_counter() - t0) / n_sub * 1e3
        print(f"{name}: {dt:.2f} ms/substep", flush=True)

    def a_independent():
        def body(c, _):
            out, _ = ps.fused_substep(frame, rows + c * 1e-30, phys, r, n,
                                      tune=tune)
            # finite-guarded seed: an inf/NaN lane in `out` would poison
            # every later iteration's input (see passes_tpu.tsum note)
            fin = jnp.where(jnp.isfinite(out), out, 0.0)
            return jnp.sum(fin) * 1e-30, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=ITER)[0]

    def b_dependent():
        def body(c, _):
            rws, cert = c
            rws, cc = ps.fused_substep(frame, rws, phys, r, n, tune=tune)
            return (rws, cert + cc), None
        (out, _), _ = jax.lax.scan(body, (rows, jnp.int32(0)), None,
                                   length=ITER)
        return out

    def c_nested():
        def inner(c, _):
            rws, cert = c
            rws, cc = ps.fused_substep(frame, rws, phys, r, n, tune=tune)
            return (rws, cert + cc), None

        def outer(c, _):
            return jax.lax.scan(inner, c, None, length=5)[0], None

        (out, _), _ = jax.lax.scan(outer, (rows, jnp.int32(0)), None,
                                   length=4)
        return out

    def d_nocert():
        def body(rws, _):
            rws, _ = ps.fused_substep(frame, rws, phys, r, n, tune=tune)
            return rws, None
        return jax.lax.scan(body, rows, None, length=ITER)[0]

    timed("A independent scan20", a_independent, ITER)
    timed("B dependent scan20  ", b_dependent, ITER)
    timed("C nested 4x5 dep    ", c_nested, ITER)
    timed("D dependent, no cert", d_nocert, ITER)
    # repeat A and B to bound run-to-run noise
    timed("A2 independent      ", a_independent, ITER)
    timed("B2 dependent        ", b_dependent, ITER)
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
