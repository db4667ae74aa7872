"""Why do same-input replicas price a frame at ~315 ms when the true chain
prices ~533 at the same depth (x1.67, all depths, any chain structure)?

Three scan20 variants, NO chaining (scalar seed only), all on frame-100
content:
  I   same state, same buffer every iteration        (the classic replica)
  II  alternate two DIFFERENT states (frame 100 vs 110)
  III alternate two COPIES of the same state (same values, two buffers)

II >> I => executing on varying CONTENT is the cost (replicas lie).
III >> I => buffer identity/allocation effects (replicas lie differently).
II ~ III ~ I => chain magic excluded elsewhere; escalate.

Usage: python scripts/probe_replica_tpu.py [log2_n] [evolve]
"""
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")
ITER = 20


def main():
    signal.signal(signal.SIGALRM, lambda *a: os._exit(9))
    signal.alarm(3000)

    import jax
    import jax.numpy as jnp
    from sphfluidsimulation_tpu.bench import scaled_config
    from sphfluidsimulation_tpu.ops import pallas_sph as ps
    from sphfluidsimulation_tpu.params import PhysParams
    from sphfluidsimulation_tpu.sim.stepper import (
        ParticleState, _metrics, initial_state, make_rollout)
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
    from sphfluidsimulation_tpu.utils.profiling import device_sync

    enable_compilation_cache()
    float(jnp.sum(jnp.ones(8)))
    print("TPU up", flush=True)

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    evolve = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cfg = scaled_config(1 << log2_n)
    r, n = cfg.bucket_resolution, cfg.n_particles
    phys = PhysParams.from_config(cfg)
    tune = ps.default_tuning()

    roll10 = make_rollout(cfg, 10, neighbor="pallas", scan_unroll=True)
    st = initial_state(cfg)
    for _ in range(evolve // 10):
        st, _ = roll10(st)
    device_sync(st.pos)
    stB, _ = roll10(st)
    device_sync(stB.pos)
    print(f"evolved {evolve} (+10 for B)", flush=True)
    pid0 = jnp.arange(n, dtype=jnp.int32)

    def frame_body(pos, vel, nan_count, pid):
        frame, (pos_s, vel_s, nan_s) = ps.build_frame(
            pos, r, cfg.voxel_capacity, extras=(pos, vel, nan_count),
            gid=pid, tune=tune)
        rho_s, dcert = ps.density_pass(frame, pos_s, phys, r, n, tune)
        rows = ps.pack_rows(pos_s, vel_s, rho_s, None, n, tune)

        def sub(c, _):
            rws, cert = c
            rws, cc = ps.fused_substep(frame, rws, phys, r, n, tune=tune)
            return (rws, cert + cc), None

        (rows, cert), _ = jax.lax.scan(sub, (rows, jnp.int32(0)), None,
                                       length=cfg.substeps,
                                       unroll=cfg.substeps)
        pos_s, vel_s, _, nh = ps.unpack_rows(rows, n)
        stt = ParticleState(pos=pos_s, vel=vel_s, nan_count=nan_s + nh)
        m = _metrics(stt, rho_s, jnp.sum(nh),
                     jnp.sum(~frame.occ).astype(jnp.int32), phys,
                     exact_cert=cert + dcert + frame.clip_count)
        return pos_s, vel_s, stt.nan_count, frame.order, m

    def tsum(x):
        return sum(jnp.sum(jnp.where(jnp.isfinite(l.astype(jnp.float32)),
                                     l.astype(jnp.float32), 0.0))
                   for l in jax.tree.leaves(x))

    def timed(name, sA, sB):
        @jax.jit
        def f():
            def body(c, i):
                pos = jnp.where(i % 2 == 0, sA.pos, sB.pos)
                vel = jnp.where(i % 2 == 0, sA.vel, sB.vel)
                nc = jnp.where(i % 2 == 0, sA.nan_count, sB.nan_count)
                outs = frame_body(pos + c * 1e-30, vel, nc, pid0)
                return tsum(outs) * 1e-30, None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(ITER))[0]

        float(f())
        t0 = time.perf_counter()
        float(f())
        print(f"{name}: {(time.perf_counter()-t0)/ITER*1e3:.1f} ms/frame",
              flush=True)

    stA2 = jax.tree.map(lambda x: x + 0, st)   # same values, new buffers
    timed("I   same state       ", st, st)
    timed("II  alternate 100/110", st, stB)
    timed("III same values 2 buf", st, stA2)
    timed("I b same state       ", st, st)
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
