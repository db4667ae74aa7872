"""Throughput benchmark: particle-substeps/sec/chip on the dam-break.

Workload: the reference's canonical dam-break scene (preset 2 spawn, golden
physics constants, SampleScene.unity:362-376) scaled to the requested
particle count with the bucket resolution scaled like the golden config
(occupancy-preserving: R ∝ N^(1/3), golden 262144 → 47).

Methodology: one jitted ``lax.scan`` rollout per chunk (a single device
dispatch — per-dispatch latency on the tunneled TPU is seconds);
synchronization forces a scalar transfer because block_until_ready can
return early over the tunnel (utils/profiling.py).
"""

from __future__ import annotations

import os
import time

import jax

from .config import SimConfig
from .sim.stepper import initial_state, make_rollout
from .utils.profiling import device_sync

NORTH_STAR = 1e9  # particle-substeps/sec/chip @ 1M (BASELINE.json)


def _site_bands(cfg: SimConfig) -> int:
    """Resolved z-band count of a sites-tier run (0=auto in the config)."""
    from .ops import sites
    return cfg.site_bands or sites.auto_bands(cfg.bucket_resolution)


def _host_rollout(cfg: SimConfig, state, frames: int, warmup_frames: int,
                  neighbor: str, tune):
    """Frame rollout as chained host dispatches of ONE jitted frame step.

    The flagship-scale sites program is stable as a single-frame dispatch
    but the frames-lax.scan composition of the very same step function
    reproducibly faults the TPU worker at 1M (bisect: scripts/
    probe_banded_tpu.py — binding/density/force/frame all pass, roll3
    crashes). Chaining the per-frame jit on the host sidesteps the scan;
    dispatches are async so the device still runs frames back-to-back
    (per-frame metrics stay on device until the final sync).
    """
    import jax
    import jax.numpy as jnp

    from .sim.stepper import make_frame_step

    step = jax.jit(make_frame_step(cfg, neighbor=neighbor,
                                   pallas_tune=tune))
    t0 = time.perf_counter()
    for _ in range(max(warmup_frames, 1)):
        state, m = step(state)
    device_sync(state.pos)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    ms = []
    for _ in range(frames):
        state, m = step(state)
        ms.append(m)
    device_sync(state.pos)
    elapsed = time.perf_counter() - t0
    metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *ms)
    return state, (state, metrics), compile_s, elapsed


def scaled_config(n_particles: int,
                  site_capacity: int | None = None) -> SimConfig:
    """Golden physics at a given N; R scales to preserve voxel occupancy."""
    base_r = 47
    r = max(3, round(base_r * (n_particles / 262144.0) ** (1.0 / 3.0)))
    kw = {} if site_capacity is None else {"site_capacity": site_capacity}
    return SimConfig(particle_number=n_particles, bucket_resolution=r, **kw)


def run_bench(n_particles: int = 1 << 20, frames: int = 20,
              warmup_frames: int = 5, neighbor: str = "pallas",
              site_capacity: int | None = None, pallas_tune=None,
              host_loop: bool = False, steady_frames: int = 0) -> dict:
    from .ops.pallas_sph import default_tuning
    tune = pallas_tune or default_tuning()
    cfg = scaled_config(n_particles, site_capacity)
    state = initial_state(cfg)

    # substep-scan unroll: +1.5-2% measured, compiled-bit-identical
    # (certs/overflow match the scanned build on the TPU A/B); opt-in at
    # the rollout level because CPU-interpret re-fusion can shift 1 ulp
    unroll = os.environ.get("SPH_SCAN_UNROLL", "1") == "1"
    if host_loop:
        state, out, compile_s, elapsed = _host_rollout(
            cfg, state, frames, warmup_frames, neighbor, tune)
    else:
        warm = make_rollout(cfg, warmup_frames, neighbor=neighbor,
                            pallas_tune=tune, scan_unroll=unroll)
        t0 = time.perf_counter()
        out = warm(state)
        device_sync(out[0].pos)
        compile_s = time.perf_counter() - t0
        state = out[0]

        roll = make_rollout(cfg, frames, neighbor=neighbor,
                            pallas_tune=tune, scan_unroll=unroll)
        out = roll(state)      # separate compile for the timed length
        device_sync(out[0].pos)
        t0 = time.perf_counter()
        out = roll(out[0])
        device_sync(out[0].pos)
        elapsed = time.perf_counter() - t0

    # Steady-state window (VERDICT r3 item 5): frame cost grows ~466->615
    # ms/frame over the first ~130 frames at 1M as the dam evolves
    # (scripts/probe_framecost_tpu.py), so the spawn-window headline is
    # optimistic. Reuse the already-compiled rollout to roll deeper and
    # time one late window.
    steady = None
    if steady_frames and not host_loop:
        frame0 = warmup_frames + 2 * frames  # frames already simulated
        reps = max(1, steady_frames // frames)
        st = out[0]
        for _ in range(reps - 1):
            st = roll(st)[0]
        device_sync(st.pos)
        t0 = time.perf_counter()
        out = roll(st)
        device_sync(out[0].pos)
        s_elapsed = time.perf_counter() - t0
        w0 = frame0 + (reps - 1) * frames
        steady = {
            "steady_state_value": round(
                cfg.n_particles * cfg.substeps * frames / s_elapsed, 1),
            "steady_state_frames_window": [w0, w0 + frames],
            "steady_state_elapsed_s": round(s_elapsed, 3),
        }

    import jax.numpy as jnp
    m = out[1]
    cert = int(jnp.sum(m.exact_cert))
    ovf = int(jnp.max(m.overflow))
    rate = cfg.n_particles * cfg.substeps * frames / elapsed
    extra = steady or {}
    return {
        **extra,
        "metric": "particle-substeps/sec/chip (dam-break, faithful mode)",
        "value": round(rate, 1),
        "unit": "particle-substeps/s",
        "vs_baseline": round(rate / NORTH_STAR, 4),
        "n_particles": cfg.n_particles,
        "bucket_resolution": cfg.bucket_resolution,
        "frames_timed": frames,
        "elapsed_s": round(elapsed, 3),
        "compile_plus_warmup_s": round(compile_s, 1),
        "neighbor": neighbor,
        "pallas_tuning": (tune._asdict() if neighbor == "pallas" else None),
        "scan_unroll": unroll,
        "site_capacity": cfg.site_capacity if neighbor == "sites" else None,
        "site_bands": (_site_bands(cfg) if neighbor == "sites" else None),
        "host_loop": host_loop,
        "exact_cert_total": cert,   # candidates/sites beyond capacity
        "overflow_max": ovf,        # bucket-capacity drops (reference quirk)
        "device": str(jax.devices()[0]),
    }
