"""TPU bench comparison: sites backend at several capacities vs pallas v4.

Also reports unique-site occupancy of the 1M bench config at the end of the
timed window, to ground the capacity choice."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from sphfluidsimulation_tpu.bench import run_bench, scaled_config
from sphfluidsimulation_tpu.sim.stepper import initial_state, make_rollout
from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache


def site_occupancy(n=1 << 20, frames=25):
    cfg = scaled_config(n)
    r = cfg.bucket_resolution
    roll = make_rollout(cfg, frames, neighbor="sites")
    st = initial_state(cfg)
    st, m = roll(st)
    jax.block_until_ready(st.pos)
    pos = np.asarray(st.pos)
    cell = np.clip((pos * (r - 1)).astype(np.int32), 0, r - 1)
    cid = cell[:, 0] + cell[:, 1] * r + cell[:, 2] * r * r
    key = np.core.records.fromarrays([cid, pos[:, 0], pos[:, 1], pos[:, 2]])
    uniq, counts = np.unique(key, return_counts=True)
    spc = np.bincount(uniq["f0"], minlength=r ** 3)
    occ = spc[spc > 0]
    order = np.argsort(uniq["f0"], kind="stable")
    starts = np.searchsorted(uniq["f0"][order], uniq["f0"][order], "left")
    rank = np.arange(len(order)) - starts
    drop = {k: int(counts[order][rank >= k].sum()) for k in (8, 16, 32)}
    print(f"bench-config sites/cell after {frames} frames: max={occ.max()} "
          f"p99={np.percentile(occ, 99):.0f} mean={occ.mean():.2f} "
          f"particles-beyond-K={drop}")


def main():
    enable_compilation_cache()
    for neighbor, kcap in (("sites", 8), ("sites", 16), ("pallas", None)):
        t0 = time.time()
        try:
            res = run_bench(n_particles=1 << 20, frames=20,
                            neighbor=neighbor, site_capacity=kcap)
            print(json.dumps(res))
        except Exception as e:  # noqa: BLE001
            print(f"{neighbor}/{kcap} failed: {type(e).__name__}: {e}")
        print(f"  ({time.time() - t0:.0f}s total)")
    site_occupancy()


if __name__ == "__main__":
    main()
