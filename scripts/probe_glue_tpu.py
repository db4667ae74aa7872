#!/usr/bin/env python
"""Attribute the ~70 ms/frame non-attributable residual at 1M (VERDICT r5
perf item): ablate the per-substep XLA passes one at a time inside a
realistic 5-substep frame replica and price the deltas.

Variants (all timed as ITER-frame seeded scans, finite-guarded seeds —
BENCH_NOTES round-3 seed-poisoning rule):

  full        — the real frame body (build + density + 5 fused substeps)
  const_iv    — interval tables computed ONCE at frame start, reused by
                all 5 substeps (wrong physics, right cost shape: removes
                the per-substep interval XLA pass)
  const_fld   — fields_from_rows computed once, reused (removes the
                per-substep repack)
  const_both  — both of the above
  kernel_only — 5 fused-kernel calls on frozen frame-start tables+fields
                (the pure Mosaic cost of the substep chain)
  no_density  — full minus the density pass
  substeps_k  — full with k=1..5 substeps (marginal substep cost in situ)

Usage: python scripts/probe_glue_tpu.py [log2_n] [evolve_frames] [iters]
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    def on_alarm(*a):
        print("ALARM", flush=True)
        os._exit(9)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(3300)

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
    evolve = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    cfg = scaled_config(1 << log2_n)
    r, n = cfg.bucket_resolution, cfg.n_particles
    phys = PhysParams.from_config(cfg)
    tune = ps.default_tuning()
    state = initial_state(cfg)
    if evolve:
        from sphfluidsimulation_tpu.sim.stepper import make_rollout
        state = make_rollout(cfg, evolve, neighbor="pallas")(state)[0]
        jax.block_until_ready(state.pos)
        print(f"evolved {evolve} frames", flush=True)

    def tsum(x):
        return sum(jnp.sum(jnp.where(jnp.isfinite(l.astype(jnp.float32)),
                                     l.astype(jnp.float32), 0.0))
                   for l in jax.tree.leaves(x) if hasattr(l, "astype"))

    def timed(name, seeded_fn):
        def body(c, _):
            return tsum(seeded_fn(c * 1e-30)) * 1e-30, None

        f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                         length=iters)[0])
        float(f())
        t0 = time.perf_counter()
        float(f())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"variant": name, "ms_per_frame": round(dt, 2)}),
              flush=True)
        return dt

    def frame(s, *, const_iv=False, const_fld=False, density=True,
              substeps=5):
        fr, (ps_, vs_, _) = ps.build_frame(
            state.pos + s, r, cfg.voxel_capacity,
            extras=(state.pos, jnp.zeros_like(state.pos),
                    jnp.zeros(n, jnp.int32)),
            gid=jnp.arange(n, dtype=jnp.int32), tune=tune)
        if density:
            rho, _ = ps.density_pass(fr, ps_, phys, r, n, tune)
        else:
            rho = jnp.ones(n, jnp.float32)
        rows = ps.pack_rows(ps_, vs_, rho, None, n, tune)
        iv0 = (ps.fresh_force_intervals(fr, ps_, n, r, tune)
               if (const_iv or const_fld) else None)
        fld0 = (ps.fields_from_rows(fr, rows, n, r, tune, phys=phys)
                if const_fld else None)

        w_rows = ps.window_rows(n, r, 2, ps.E_X, tune)
        npad = ps.padded_n(n, tune)

        def sub(c, _):
            rws, cert = c
            if const_iv or const_fld:
                tiles_fr, counts_fr, cc = iv0
            else:
                pos_now = rws.reshape(-1, ps.N_FIELDS)[:n, 0:3]
                tiles_fr, counts_fr, cc = ps.fresh_force_intervals(
                    fr, pos_now, n, r, tune)
            fld = fld0 if const_fld else ps.fields_from_rows(
                fr, rws, n, r, tune, phys=phys)
            new_rows = ps._call_kernel(
                ps.N_LINES_DENS, True, r, w_rows, tune, fr.win_f,
                tiles_fr, counts_fr, rws, ps._scal(phys), fld,
                use_ext=False, fused=True, n=n)
            new_rows = new_rows.reshape(npad // tune.rows_per_tile,
                                        tune.rows_per_tile, ps.N_FIELDS)
            return (new_rows, cert + cc), None

        (rows, cert), _ = jax.lax.scan(sub, (rows, jnp.int32(0)), None,
                                       length=substeps)
        return rows

    timed("full", lambda s: frame(s))
    timed("const_iv", lambda s: frame(s, const_iv=True))
    timed("const_fld", lambda s: frame(s, const_iv=True, const_fld=True,
                                       density=True))
    timed("no_density", lambda s: frame(s, density=False))
    for k in (1, 3):
        timed(f"substeps_{k}", lambda s, k=k: frame(s, substeps=k))

    # kernel-only chain: frozen tables+fields, rows chained through the
    # kernel — the pure Mosaic cost of 5 dependent fused dispatches
    fr, (ps_, vs_, _) = ps.build_frame(
        state.pos, r, cfg.voxel_capacity,
        extras=(state.pos, jnp.zeros_like(state.pos),
                jnp.zeros(n, jnp.int32)),
        gid=jnp.arange(n, dtype=jnp.int32), tune=tune)
    rho, _ = ps.density_pass(fr, ps_, phys, r, n, tune)
    rows0 = ps.pack_rows(ps_, vs_, rho, None, n, tune)
    iv = ps.fresh_force_intervals(fr, ps_, n, r, tune)
    fld = ps.fields_from_rows(fr, rows0, n, r, tune, phys=phys)
    w_rows = ps.window_rows(n, r, 2, ps.E_X, tune)
    npad = ps.padded_n(n, tune)

    def kchain(s):
        def sub(rws, _):
            out = ps._call_kernel(
                ps.N_LINES_DENS, True, r, w_rows, tune, fr.win_f,
                iv[0], iv[1], rws, ps._scal(phys), fld,
                use_ext=False, fused=True, n=n)
            return out.reshape(npad // tune.rows_per_tile,
                               tune.rows_per_tile, ps.N_FIELDS), None
        out, _ = jax.lax.scan(sub, rows0 + s, None, length=5)
        return out

    timed("kernel_only5", kchain)
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
