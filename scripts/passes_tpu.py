"""Per-pass timing table on the TPU at golden scale (VERDICT #2's ask):
build_frame / pack_fields / pack_rows / fresh intervals / density / force.

Usage: python scripts/passes_tpu.py [log2_n]   (default 18 -> 262k)

Each pass runs ITER times inside one lax.scan dispatch; a scalar seed is
chained through the iterations (added at 1e-30 scale to a float input) so
XLA can neither hoist the loop-invariant computation nor DCE it. One
process, os._exit at the end to skip the worker-crashing teardown.
"""
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")
ITER = 20


def main():
    def on_alarm(*a):
        print("ALARM", flush=True)
        os._exit(9)

    signal.signal(signal.SIGALRM, on_alarm)
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

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    cfg = scaled_config(1 << log2_n)
    print(f"n = {cfg.n_particles}, R = {cfg.bucket_resolution}", flush=True)
    r, n = cfg.bucket_resolution, cfg.n_particles
    phys = PhysParams.from_config(cfg)
    state = initial_state(cfg)

    # Optional: evolve the state first. The spawn state UNDERSTATES the
    # steady-state per-pass cost (the chain probe measured 59 ms/substep on
    # frozen spawn rows vs ~76-91 ms on evolved states at 1M — wall pileup
    # and drift widen the candidate work); pass an evolve frame count to
    # time the passes on the workload the bench actually runs.
    evolve = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if evolve:
        from sphfluidsimulation_tpu.sim.stepper import make_rollout
        roll = make_rollout(cfg, evolve, neighbor="pallas")
        state = roll(state)[0]
        jax.block_until_ready(state.pos)
        print(f"evolved {evolve} frames", flush=True)

    frame, (pos_s, vel_s) = jax.jit(
        lambda p: ps.build_frame(p, r, cfg.voxel_capacity,
                                 extras=(p, jnp.zeros_like(p))))(state.pos)
    rho_s = jax.jit(lambda f, p: ps.density_pallas(f, p, phys, r, n))(
        frame, pos_s)
    jax.block_until_ready(rho_s)

    def tsum(x):
        # finite-guarded: on violent evolved states pass outputs hold
        # inf/NaN; an unguarded sum turns the seed NaN and every later
        # iteration then runs on NaN-poisoned inputs whose worklists are
        # near-empty — silently timing fake-cheap frames (round-3 probe
        # postmortem, BENCH_NOTES "the seed-poisoning artifact")
        return sum(jnp.sum(jnp.where(jnp.isfinite(l.astype(jnp.float32)),
                                     l.astype(jnp.float32), 0.0))
                   for l in jax.tree.leaves(x) if hasattr(l, "astype"))

    def timed(name, seeded_fn):
        """seeded_fn(seed_scalar) -> anything; seed feeds the next iter."""
        def body(c, _):
            return tsum(seeded_fn(c * 1e-30)) * 1e-30, None

        f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                         length=ITER)[0])
        float(f())  # compile + warm
        t0 = time.perf_counter()
        float(f())
        dt = (time.perf_counter() - t0) / ITER * 1e3
        print(f"{name}: {dt:.3f} ms", flush=True)

    timed("build_frame+extras", lambda s: ps.build_frame(
        state.pos + s, r, cfg.voxel_capacity,
        extras=(state.pos, jnp.zeros_like(state.pos)))[0].cid)
    tune = ps.default_tuning()
    timed("pack_fields", lambda s: ps.pack_fields(
        frame, pos_s + s, vel_s, rho_s, n, r, tune, phys=phys))
    timed("pack_rows", lambda s: ps.pack_rows(
        pos_s + s, vel_s, rho_s, frame.cid, n, tune))
    timed("fresh_intervals", lambda s: ps.fresh_force_intervals(
        frame, pos_s + s, n, r, tune)[0])
    timed("density_kernel", lambda s: ps.density_pallas(
        frame, pos_s + s, phys, r, n))
    timed("force_full", lambda s: ps.forces_pallas(
        frame, pos_s + s, vel_s, rho_s, phys, r, n)[0])
    rows = ps.pack_rows(pos_s, vel_s, rho_s, None, n, tune)
    timed("fields_from_rows", lambda s: ps.fields_from_rows(
        frame, rows + s, n, r, tune, phys=phys))
    timed("fused_substep", lambda s: ps.fused_substep(
        frame, rows + s, phys, r, n, tune=tune)[0])
    timed("unsort", lambda s: jnp.zeros_like(pos_s).at[frame.order]
          .set(pos_s + s))

    # substep-scan ablations: is the ~30% gap between sum-of-parts and the
    # composed frame in the substep scan itself, or in the composition?
    def substep_scan(s, length, unroll):
        def sub(c, _):
            rws, cert = c
            rws, cc = ps.fused_substep(frame, rws, phys, r, n, tune=tune)
            return (rws, cert + cc), None

        (out, cert), _ = jax.lax.scan(
            sub, (rows + s, jnp.int32(0)), None, length=length,
            unroll=length if unroll else 1)
        return out

    timed("substep_scan5", lambda s: substep_scan(s, 5, False))
    timed("substep_scan5_unrolled", lambda s: substep_scan(s, 5, True))

    # whole-frame replicas of the rollout body, to localize glue not
    # covered by the per-pass rows above (scan carries, metrics, ...)
    from sphfluidsimulation_tpu.sim.stepper import _metrics, ParticleState

    def whole_frame(s, with_metrics):
        fr, (ps_, vs_, ns_) = ps.build_frame(
            state.pos + s, r, cfg.voxel_capacity,
            extras=(state.pos, jnp.zeros_like(state.pos),
                    jnp.zeros(n, jnp.int32)),
            gid=jnp.arange(n, dtype=jnp.int32), tune=tune)
        rho, dcert = ps.density_pass(fr, ps_, phys, r, n, tune)
        rws = ps.pack_rows(ps_, vs_, rho, None, n, tune)

        def sub(c, _):
            rws, cert = c
            rws, cc = ps.fused_substep(fr, rws, phys, r, n, tune=tune)
            return (rws, cert + cc), None

        (rws, cert), _ = jax.lax.scan(sub, (rws, jnp.int32(0)), None,
                                      length=cfg.substeps)
        p2, v2, _, nh = ps.unpack_rows(rws, n)
        if not with_metrics:
            return p2
        st = ParticleState(pos=p2, vel=v2, nan_count=nh)
        m = _metrics(st, rho, jnp.sum(nh), jnp.sum(~fr.occ), phys,
                     exact_cert=cert + dcert + fr.clip_count)
        return (p2, m)

    timed("frame_no_metrics", lambda s: whole_frame(s, False))
    timed("frame_with_metrics", lambda s: whole_frame(s, True))
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
