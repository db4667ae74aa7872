"""Round-2 follow-up: (1) is the golden-scene explosion intrinsic (slotted,
exact backend) or a pallas artifact? (2) unique-position site counts per
cell — the capacity the site-grid backend needs."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sphfluidsimulation_tpu.config import GOLDEN_CONFIG
from sphfluidsimulation_tpu.sim.stepper import initial_state, make_rollout


def site_stats(pos, r):
    """Per-cell unique-position counts (host-side, numpy)."""
    pos = np.asarray(pos)
    cell = (pos * (r - 1)).astype(np.int32)
    cid = cell[:, 0] + cell[:, 1] * r + cell[:, 2] * r * r
    cid = np.clip(cid, 0, r**3 - 1)
    # unique (cid, x, y, z) rows
    key = np.core.records.fromarrays(
        [cid, pos[:, 0], pos[:, 1], pos[:, 2]])
    uniq, counts = np.unique(key, return_counts=True)
    sites_per_cell = np.bincount(uniq["f0"], minlength=r**3)
    occ = sites_per_cell[sites_per_cell > 0]
    particles_dropped_at = {
        k: int(np.sum(np.maximum(sites_per_cell - k, 0) > 0) and
               int(counts[np.argsort(-counts)][:0].sum()))
        for k in ()}
    # particles in sites beyond rank K (approx: order sites by position)
    drop = {}
    for k in (4, 8, 16, 32):
        # sites sorted within cell: count particles in sites with rank >= k
        order = np.argsort(uniq["f0"], kind="stable")
        cids_sorted = uniq["f0"][order]
        counts_sorted = counts[order]
        starts = np.searchsorted(cids_sorted, cids_sorted, side="left")
        rank = np.arange(len(cids_sorted)) - starts
        drop[k] = int(counts_sorted[rank >= k].sum())
    return (int(occ.max()), float(np.percentile(occ, 99)),
            float(occ.mean()), drop)


def main(frames=100, every=10, neighbor="slotted"):
    cfg = GOLDEN_CONFIG
    r = cfg.bucket_resolution
    rollout = make_rollout(cfg, frames, neighbor=neighbor,
                           snapshot_every=every)
    state = initial_state(cfg)
    t0 = time.time()
    out = rollout(state)
    final, m, snaps = out
    jax.block_until_ready(final.pos)
    print(f"[{neighbor}] rollout {frames} frames: {time.time()-t0:.1f}s")
    ms = np.asarray(m.max_speed)
    ne = np.asarray(m.nan_events)
    print(f"[{neighbor}] max_speed: f1={ms[0]:.2f} f10={ms[9]:.2f} "
          f"f50={ms[49]:.2f} f{frames}={ms[-1]:.2f} "
          f"overall_max={np.nanmax(ms):.3g} nans_total={ne.sum()}")
    print(f"[{neighbor}] spawn pos range: min={np.asarray(snaps[0]).min():.4f}"
          f" max={np.asarray(snaps[0]).max():.4f}")
    for i in range(snaps.shape[0]):
        mx, p99, mean, drop = site_stats(snaps[i], r)
        print(f"[{neighbor}] frame {(i+1)*every:4d}: max_sites/cell={mx} "
              f"p99={p99:.0f} mean={mean:.2f} dropped@K={drop}")


if __name__ == "__main__":
    main(frames=int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         neighbor=sys.argv[2] if len(sys.argv) > 2 else "slotted")
