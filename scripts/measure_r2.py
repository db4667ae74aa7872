"""Round-2 design measurements (run on the tunneled TPU).

1. Golden-scene voxel occupancy distribution over a rollout (drives the
   dense-slot capacity K of the round-2 dense backend).
2. Per-frame max speed -> cells crossed per substep (drives the adaptive
   window escalation ladder).
3. TPU primitive costs at 1M: lax.sort variants, scatter/gather to slots.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from sphfluidsimulation_tpu.config import GOLDEN_CONFIG
from sphfluidsimulation_tpu.params import PhysParams
from sphfluidsimulation_tpu.sim.stepper import initial_state, make_rollout


def occupancy_study(frames=200, every=10):
    cfg = GOLDEN_CONFIG
    r = cfg.bucket_resolution
    rollout = make_rollout(cfg, frames, neighbor="slotted",
                           snapshot_every=every)
    state = initial_state(cfg)
    t0 = time.time()
    final, m, snaps = rollout(state)
    jax.block_until_ready(final.pos)
    print(f"rollout {frames} frames: {time.time()-t0:.1f}s")

    @jax.jit
    def occ_stats(pos):
        cell = (pos * (r - 1)).astype(jnp.int32)
        cid = cell[:, 0] + cell[:, 1] * r + cell[:, 2] * r * r
        cid = jnp.clip(cid, 0, r**3 - 1)
        counts = jnp.zeros(r**3, jnp.int32).at[cid].add(1)
        occupied = counts > 0
        hist = jnp.array([jnp.sum((counts > lo) & (counts <= hi))
                          for lo, hi in ((0, 2), (2, 4), (4, 8), (8, 16),
                                         (16, 32), (32, 64), (64, 10**9))])
        # particles dropped if slot capacity were K
        drop = jnp.array([jnp.sum(jnp.maximum(counts - k, 0))
                          for k in (4, 8, 16, 32)])
        return jnp.max(counts), jnp.sum(occupied), hist, drop

    h = cfg.effective_radius
    dt = cfg.substep_dt
    ms = np.asarray(m.max_speed)
    print(f"max_speed per frame: p50={np.percentile(ms,50):.2f} "
          f"p95={np.percentile(ms,95):.2f} max={ms.max():.2f}")
    print(f"cells/substep (max_speed*dt/h): p50="
          f"{np.percentile(ms,50)*dt/h:.2f} max={ms.max()*dt/h:.2f}")
    for i in range(snaps.shape[0]):
        mx, nocc, hist, drop = occ_stats(snaps[i])
        print(f"frame {(i+1)*every:4d}: max_occ={int(mx):3d} "
              f"occupied={int(nocc):6d} "
              f"hist(1-2,3-4,5-8,9-16,17-32,33-64,>64)={list(np.asarray(hist))} "
              f"dropped@K(4,8,16,32)={list(np.asarray(drop))}")


def primitive_costs(n=1 << 20, r=75, cap=8):
    s = r**3
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), jnp.float32)
    cell = (pos * (r - 1)).astype(jnp.int32)
    cid = (cell[:, 0] + cell[:, 1] * r + cell[:, 2] * r * r).astype(jnp.int32)
    vals = [jax.random.normal(jax.random.PRNGKey(i), (n,), jnp.float32)
            for i in range(6)]

    def timeit(name, fn, *args):
        out = jax.block_until_ready(jax.jit(fn)(*args))
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"{name}: {(time.time()-t0)/reps*1e3:.2f} ms")
        return out

    timeit("argsort(cid) [N=1M]", lambda c: jnp.argsort(c), cid)
    timeit("sort key+1op", lambda c, v: jax.lax.sort((c, v), num_keys=1),
           cid, vals[0])
    timeit("sort key+6op",
           lambda c, *vs: jax.lax.sort((c,) + vs, num_keys=1), cid, *vals)
    order = jnp.argsort(cid).astype(jnp.int32)
    timeit("gather 6 fields by order",
           lambda o, *vs: tuple(v[o] for v in vs), order, *vals)
    # scatter sorted values into slot array [cap * s]
    sorted_cid = cid[order]
    run_start = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = (jnp.arange(n) - run_start).astype(jnp.int32)
    slot = jnp.where(rank < cap, sorted_cid * cap + rank, cap * s)
    timeit("scatter 6 fields into slots [K*S]",
           lambda sl, *vs: tuple(
               jnp.zeros(cap * s, jnp.float32).at[sl].set(v, mode="drop")
               for v in vs), slot, *vals)
    # dense elementwise pass over [K*S] flavor arrays: 27 shifted reads
    ks = cap * s
    big = [jnp.zeros(ks + 2 * (r * r + r + 1), jnp.float32) for _ in range(4)]

    def dense_pass(px, py, pz, rho):
        acc = jnp.zeros(ks, jnp.float32)
        p0 = px[r * r + r + 1:][:ks]
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    off = r * r + r + 1 + dx + dy * r + dz * r * r
                    q = px[off:][:ks]
                    d = p0 - q
                    acc = acc + jnp.where(d * d < 0.5, d * d * d, 0.0)
        return acc

    timeit(f"27-shift dense pass [K*S={ks}] 1 field", dense_pass, *big)


if __name__ == "__main__":
    print("devices:", jax.devices())
    primitive_costs()
    occupancy_study()
