#!/usr/bin/env python
"""Decompose build_frame's cost at scale (round-5 glue attack).

probe_glue_tpu.py localized ~84 ms/frame at 1M (evolved) OUTSIDE the
kernel/intervals/fields/density passes — i.e. in build_frame + pack_rows
+ scan glue. This probe prices each build ingredient separately:

  sort_full   — lax.sort, 2 keys + 9 payload operands (shipped shape)
  sort_2      — lax.sort, (key, gid) only
  sort_4      — lax.sort, (key, gid, raw, idx): the minimum that
                supports gathering the payload afterwards
  gather7     — one fused jit of 7 take()s via the sort permutation
                (the alternative to sorting payloads as operands)
  searchsorted— start-table build (r^3+1 queries into the sorted cids)
  pack_rows   — the rows-layout pack
  build_full  — whole build_frame (+3 sort extras) + pack_rows

Usage: python scripts/probe_build_tpu.py [log2_n] [evolve_frames] [iters]
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
    from sphfluidsimulation_tpu.sim.stepper import initial_state, make_rollout
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    float(jnp.sum(jnp.ones(8)))
    print("TPU up", flush=True)

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    evolve = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    cfg = scaled_config(1 << log2_n)
    r, n = cfg.bucket_resolution, cfg.n_particles
    tune = ps.default_tuning()
    state = initial_state(cfg)
    if evolve:
        state = make_rollout(cfg, evolve, neighbor="pallas")(state)[0]
        jax.block_until_ready(state.pos)
        print(f"evolved {evolve} frames, r={r}", flush=True)

    pos, vel = state.pos, state.vel
    nanc = jnp.zeros(n, jnp.float32)
    gid = jnp.arange(n, dtype=jnp.int32)

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
        print(json.dumps({"variant": name, "ms": round(dt, 2)}), flush=True)
        return dt

    def keys(s):
        cell = ((pos + s) * (r - 1)).astype(jnp.int32)
        cid_raw = cell[:, 0] + cell[:, 1] * r + cell[:, 2] * (r * r)
        ac = jnp.clip(cell, 0, r - 1)
        cid_key = ac[:, 0] + ac[:, 1] * r + ac[:, 2] * (r * r)
        in_r = ((cid_raw >= 0) & (cid_raw < r * r * r)).astype(jnp.int32)
        return cid_key, cid_raw, in_r

    def sort_full(s):
        k, raw, in_r = keys(s)
        return jax.lax.sort(
            (k, gid, raw, in_r, pos[:, 0], pos[:, 1], pos[:, 2],
             vel[:, 0], vel[:, 1], vel[:, 2], nanc),
            num_keys=2, is_stable=False)[0]

    def sort_2(s):
        k, _, _ = keys(s)
        return jax.lax.sort((k, gid), num_keys=2, is_stable=False)[0]

    def sort_4(s):
        k, raw, _ = keys(s)
        return jax.lax.sort((k, gid, raw, gid), num_keys=2,
                            is_stable=False)[0]

    perm = jax.lax.sort((keys(0.0)[0], gid), num_keys=2,
                        is_stable=False)[1]

    def gather7(s):
        p = perm
        return (jnp.take(pos[:, 0] + s, p), jnp.take(pos[:, 1], p),
                jnp.take(pos[:, 2], p), jnp.take(vel[:, 0], p),
                jnp.take(vel[:, 1], p), jnp.take(vel[:, 2], p),
                jnp.take(nanc, p))

    cid_s = jax.lax.sort((keys(0.0)[0], gid), num_keys=2,
                         is_stable=False)[0]

    def ssorted(s):
        return jnp.searchsorted(
            cid_s + jnp.int32(s), jnp.arange(r * r * r + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)

    def packr(s):
        return ps.pack_rows(pos + s, vel, nanc, None, n, tune)

    def build_full(s):
        fr, (p_, v_, nn) = ps.build_frame(
            pos + s, r, cfg.voxel_capacity,
            extras=(pos, vel, jnp.zeros(n, jnp.int32)),
            gid=gid, tune=tune)
        return ps.pack_rows(p_, v_, jnp.ones(n, jnp.float32), None, n, tune)

    timed("sort_full", sort_full)
    timed("sort_2", sort_2)
    timed("sort_4", sort_4)
    timed("gather7", gather7)
    timed("searchsorted", ssorted)
    timed("pack_rows", packr)
    timed("build_full", build_full)
    signal.alarm(0)
    os._exit(0)


if __name__ == "__main__":
    main()
