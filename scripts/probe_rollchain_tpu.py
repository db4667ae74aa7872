"""Why does the frames-lax.scan rollout cost ~50% more per frame than a
same-state whole-frame replica (466-615 vs ~315 ms at 1M)?

In ONE process, from the same evolved state:
  T1 scan10   : make_rollout(10) — the bench's program (baseline)
  T2 replica  : scan10 of the frame body, SCALAR seed carry, state reused
  T3 chain10  : scan10 of the frame body, REAL array carry (pos/vel/nan/pid)
  T5 host10   : ten host dispatches of one jitted whole-frame step (true
                dependence, no frames-scan)
T3 vs T2 isolates array-carry/chained-content cost inside a scan;
T5 vs T1 prices the frames-scan itself against host chaining.

Usage: python scripts/probe_rollchain_tpu.py [log2_n] [evolve_frames]
"""
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    signal.signal(signal.SIGALRM, lambda *a: os._exit(9))
    signal.alarm(3300)

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
    print(f"evolved {evolve} frames", flush=True)

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

    def timed(name, fn, per):
        fn()  # compile + warm
        t0 = time.perf_counter()
        out = fn()
        device_sync(out)
        dt = (time.perf_counter() - t0) / per * 1e3
        print(f"{name}: {dt:.1f} ms/frame", flush=True)

    # T1: the bench's scan-of-frames program
    def t1():
        s2, m = roll10(st)
        return s2.pos

    # T2: replica, scalar seed carry, same state each iteration
    def tsum(x):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(x) if hasattr(l, "astype"))

    pid0 = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def t2_f():
        def body(c, _):
            outs = frame_body(st.pos + c * 1e-30, st.vel, st.nan_count,
                              pid0)
            return tsum(outs) * 1e-30, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=10)[0]

    # T3: real array carry through a scan of frames
    @jax.jit
    def t3_f():
        def body(c, _):
            pos, vel, nan, pid = c
            pos, vel, nan, pid, m = frame_body(pos, vel, nan, pid)
            return (pos, vel, nan, pid), m
        (pos, vel, nan, pid), m = jax.lax.scan(
            body, (st.pos, st.vel, st.nan_count, pid0), None, length=10)
        return pos

    # T5: host-chained whole-frame dispatches
    step = jax.jit(frame_body)

    def t5():
        pos, vel, nan, pid = st.pos, st.vel, st.nan_count, pid0
        for _ in range(10):
            pos, vel, nan, pid, m = step(pos, vel, nan, pid)
        return pos

    timed("T1 scan10 (bench)  ", t1, 10)
    timed("T2 replica scalar  ", lambda: t2_f(), 10)
    timed("T3 scan10 arr carry", lambda: t3_f(), 10)
    timed("T5 host10 chained  ", t5, 10)
    timed("T1b scan10 again   ", t1, 10)
    timed("T5b host10 again   ", t5, 10)
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
