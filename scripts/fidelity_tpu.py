"""1000-step cross-backend fidelity evidence on the real TPU (VERDICT #5).

Part A — calm config, 1024 particles: brute oracle vs slotted/pallas/sites,
RMSE at frames {1, 10, 100, 1000}; the calm regime keeps per-frame drift
within every backend's exact envelope, so tracking is provable (certs 0).

Part B — golden dam-break, 262144 particles: slotted is the pinned
reference (brute is O(N²)-infeasible at this N; slotted is brute-validated
at small N by tests/test_equivalence.py), vs sites and pallas.

Emits one JSON line per (part, backend) with the RMSE ladder and
certificate totals; saves the calm-config 1024 pin to tests/data/.
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

CHECKPOINTS = (1, 10, 100, 1000)


def _alarm(seconds: int) -> None:
    """Watchdog: axon dispatches hang forever when the worker crashes."""
    def on_alarm(*a):
        print(json.dumps({"error": "stage timed out"}), flush=True)
        os._exit(9)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def rollout_checkpoints(cfg, neighbor, state, max_chunk=100):
    import jax
    import jax.numpy as jnp
    from sphfluidsimulation_tpu.sim.stepper import make_rollout

    out, cert, ovf, nan = {}, 0, 0, 0
    done = 0
    for upto in CHECKPOINTS:
        # dispatch in <= max_chunk-frame scans: very long single scans at
        # large N can fault the tunneled TPU worker
        while done < upto:
            k = min(upto - done, max_chunk)
            roll = make_rollout(cfg, k, neighbor=neighbor)
            state, m = roll(state)
            jax.block_until_ready(state.pos)
            cert += int(jnp.sum(m.exact_cert))
            ovf = max(ovf, int(jnp.max(m.overflow)))
            nan += int(jnp.sum(m.nan_events))
            done += k
        out[upto] = state.pos
    return out, {"cert": cert, "ovf_max": ovf, "nan": nan}


def rmse(a, b):
    import jax.numpy as jnp
    return float(jnp.sqrt(jnp.mean((a - b) ** 2)))


def host_checkpoints(cfg, neighbor, state, ckpts):
    """rollout_checkpoints via chained host dispatches of one jitted frame
    step — the flagship-scale sites composition (its single-frame dispatch
    is stable at 1M where the frames-lax.scan faults the worker; see
    scripts/probe_banded_tpu.py and BENCH_NOTES round 3)."""
    import jax
    from sphfluidsimulation_tpu.sim.stepper import make_frame_step

    step = jax.jit(make_frame_step(cfg, neighbor=neighbor))
    out, cert, ovf, nan = {}, 0, 0, 0
    done = 0
    for upto in ckpts:
        while done < upto:
            state, m = step(state)
            jax.block_until_ready(state.pos)
            cert += int(m.exact_cert)
            ovf = max(ovf, int(m.overflow))
            nan += int(m.nan_events)
            done += 1
        out[upto] = state.pos
    return out, {"cert": cert, "ovf_max": ovf, "nan": nan}


def main():
    import numpy as np
    from sphfluidsimulation_tpu.config import SimConfig
    from sphfluidsimulation_tpu.sim.stepper import initial_state
    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    only = sys.argv[1] if len(sys.argv) > 1 else "all"

    # ---- Part A: calm 1024, brute oracle
    calm = SimConfig(particle_number=1024, bucket_resolution=11, preset=0,
                     gas_constant=20.0, rest_density=1.7, viscosity=0.05,
                     stiffness_coefficient=1000.0, frame_dt=1 / 240)
    if only in ("all", "a"):
        _part_a(calm, np)
    if only in ("all", "b"):
        _part_b(np)
    # extra argv tokens are part-specific (backend names for b2, particle
    # counts for e) — consume them only when that part alone is selected
    # (ADVICE round 4: `all <token>` used to crash one part or skip legs)
    extra = sys.argv[2:]
    if only in ("all", "b2"):
        _part_b2(np, legs=extra if only == "b2" else None)
    if only in ("all", "b3"):
        _part_b3(np)
    if only in ("all", "c"):
        _part_c(np)
    if only in ("all", "e"):
        _part_e(np, legs=extra if only == "e" else None)


def _part_b3(np):
    """Cross-backend table AT 1M, frames {1, 5} (round 3).

    Needs the z-banded site grids (ops/sites.py) + host-loop dispatch:
    rounds 1-2 could not run the sites tier at 1M at all. Pin = pallas.
    site_capacity=32 (the violent dam packs >16 distinct sites into wall
    voxels at this scale; the cert quantifies what remains beyond 32).
    """
    import jax
    from sphfluidsimulation_tpu.bench import scaled_config
    from sphfluidsimulation_tpu.sim.stepper import initial_state

    golden = scaled_config(1 << 20, site_capacity=32)
    st = initial_state(golden)
    ckpts = (1, 5)
    t0 = time.time()
    _alarm(3000)
    ref, stats = host_checkpoints(golden, "pallas", st, ckpts)
    print(json.dumps({"part": "golden1M_5f", "backend": "pallas(pin)",
                      **stats, "wall_s": round(time.time() - t0, 1)}),
          flush=True)
    t0 = time.time()
    _alarm(3000)
    got, stats = host_checkpoints(golden, "sites", st, ckpts)
    print(json.dumps({
        "part": "golden1M_5f", "backend": "sites",
        "rmse": {str(k): rmse(got[k], ref[k]) for k in ckpts},
        **stats, "wall_s": round(time.time() - t0, 1)}), flush=True)


def _part_a(calm, np):
    from sphfluidsimulation_tpu.sim.stepper import initial_state

    st = initial_state(calm)
    _alarm(1800)
    ref, stats = rollout_checkpoints(calm, "brute", st)
    print(json.dumps({"part": "calm1024", "backend": "brute",
                      **stats}), flush=True)
    np.savez("/root/repo/tests/data/calm1024_pin_r2.npz",
             **{f"f{k}": np.asarray(v) for k, v in ref.items()})
    for nb in ("slotted", "pallas", "sites"):
        t0 = time.time()
        _alarm(1800)
        got, stats = rollout_checkpoints(calm, nb, st)
        print(json.dumps({
            "part": "calm1024", "backend": nb,
            "rmse": {str(k): rmse(got[k], ref[k]) for k in CHECKPOINTS},
            **stats, "wall_s": round(time.time() - t0, 1)}), flush=True)


def _part_b(np):
    from sphfluidsimulation_tpu.config import SimConfig
    from sphfluidsimulation_tpu.sim.stepper import initial_state

    # ---- Part B: golden 262k. Pin = pallas (brute-validated at small N
    # by the test suite, zero-certificate on the calm 1000-step table
    # above, and the only tier whose 262k dispatches have proven stable on
    # the tunneled worker — slotted's 262k scans fault it, so slotted runs
    # LAST and in short chunks).
    golden = SimConfig(particle_number=262144, bucket_resolution=47,
                       site_capacity=24)
    st = initial_state(golden)
    t0 = time.time()
    _alarm(3600)
    ref, stats = rollout_checkpoints(golden, "pallas", st, max_chunk=20)
    print(json.dumps({"part": "golden262k", "backend": "pallas(pin)",
                      **stats, "wall_s": round(time.time() - t0, 1)}),
          flush=True)
    np.savez("/tmp/golden262k_pin_r2.npz",
             **{f"f{k}": np.asarray(v) for k, v in ref.items()})
    for nb in ("sites", "slotted"):
        t0 = time.time()
        _alarm(3600)
        got, stats = rollout_checkpoints(golden, nb, st, max_chunk=20)
        print(json.dumps({
            "part": "golden262k", "backend": nb,
            "rmse": {str(k): rmse(got[k], ref[k]) for k in CHECKPOINTS},
            **stats, "wall_s": round(time.time() - t0, 1)}), flush=True)


def _part_b2(np, legs=None):
    """Cross-backend table AT 262k, frames {1, 10, 100} (round 3).

    Part B's full-length sites/slotted legs exceed the 1h stage budget at
    262k (sites compiles ~320 s and runs ~10x slower than pallas); the
    100-frame table still exercises every 262k code path and gives the
    at-flagship-scale cross-backend RMSE that round 2 could not produce.
    Pin = pallas.
    """
    import jax
    from sphfluidsimulation_tpu.config import SimConfig
    from sphfluidsimulation_tpu.sim.stepper import initial_state

    legs = legs or ["pallas", "sites", "slotted"]
    pin_path = "/tmp/golden262k_100f_pin.npz"
    global CHECKPOINTS
    ckpts = CHECKPOINTS
    CHECKPOINTS = (1, 10, 100)
    try:
        golden = SimConfig(particle_number=262144, bucket_resolution=47,
                           site_capacity=24)
        st = initial_state(golden)
        if "pallas" in legs:
            t0 = time.time()
            _alarm(1800)
            ref, stats = rollout_checkpoints(golden, "pallas", st,
                                             max_chunk=10)
            print(json.dumps({"part": "golden262k_100f",
                              "backend": "pallas(pin)", **stats,
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
            np.savez(pin_path,
                     **{f"f{k}": np.asarray(v) for k, v in ref.items()})
        else:
            pin = np.load(pin_path)
            ref = {k: pin[f"f{k}"] for k in CHECKPOINTS}
        for nb in ("sites", "slotted"):
            if nb not in legs:
                continue
            t0 = time.time()
            _alarm(2700)
            got, stats = rollout_checkpoints(golden, nb, st, max_chunk=10)
            print(json.dumps({
                "part": "golden262k_100f", "backend": nb,
                "rmse": {str(k): rmse(got[k], ref[k])
                         for k in CHECKPOINTS},
                **stats, "wall_s": round(time.time() - t0, 1)}),
                flush=True)
    finally:
        CHECKPOINTS = ckpts


def _part_c(np):
    """Cross-backend 1000-step table at 65k (golden physics, R scaled).

    262k sites/slotted dispatches destabilize the tunneled worker
    (documented in BENCH_NOTES); 65k runs all three tiers reliably and
    still exercises the at-scale code paths (same programs, smaller
    shapes). Pin = pallas (zero-cert brute-tracking per Part A).
    """
    from sphfluidsimulation_tpu.bench import scaled_config
    from sphfluidsimulation_tpu.sim.stepper import initial_state

    cfg = scaled_config(1 << 16, site_capacity=32)
    st = initial_state(cfg)
    t0 = time.time()
    _alarm(3600)
    ref, stats = rollout_checkpoints(cfg, "pallas", st, max_chunk=45)
    print(json.dumps({"part": "golden65k", "backend": "pallas(pin)",
                      **stats, "wall_s": round(time.time() - t0, 1)}),
          flush=True)
    for nb in ("sites", "slotted"):
        t0 = time.time()
        _alarm(3600)
        got, stats = rollout_checkpoints(cfg, nb, st, max_chunk=45)
        print(json.dumps({
            "part": "golden65k", "backend": nb,
            "rmse": {str(k): rmse(got[k], ref[k]) for k in CHECKPOINTS},
            **stats, "wall_s": round(time.time() - t0, 1)}), flush=True)


def _calm_scaled(n: int):
    """Part-A calm physics scaled to ``n`` particles.

    Calmness is an occupancy property: Part A's config (N=1024, R=11,
    h=0.1) sits at ~0.77 particles/cell where the EOS stays bounded.
    Scaling R−1 ∝ N^(1/3) preserves occupancy, and since mass =
    fill/N (SphFluidSimulation.cs:176) and W ∝ 1/h³, densities — and
    therefore the whole force field — stay in the same calm regime at
    any N. All other knobs are Part A's exactly.
    """
    from sphfluidsimulation_tpu.config import SimConfig

    r = int(round(1 + 10 * (n / 1024) ** (1.0 / 3.0)))
    return SimConfig(particle_number=n, bucket_resolution=r, preset=0,
                     gas_constant=20.0, rest_density=1.7, viscosity=0.05,
                     stiffness_coefficient=1000.0, frame_dt=1 / 240)


def _part_e(np, legs=None):
    """Calm-config 1000-frame oracle tracking at 65k and 262k (round 4).

    Part A proved pallas tracks the brute oracle to 1.9e-5 @1000 with
    cert 0 — at 1024 particles only. This scales the SAME calm physics
    to flagship sizes. Oracle = slotted: brute is O(N²)-infeasible at
    262k, and slotted is brute-equal at small N (tests/test_equivalence)
    and brute-tracking on Part A itself; pins in chunks (long slotted
    scans at scale can fault the tunneled worker).
    """
    from sphfluidsimulation_tpu.sim.stepper import initial_state

    legs = legs or ["65536", "262144"]
    for ns in legs:
        n = int(ns)
        cfg = _calm_scaled(n)
        st = initial_state(cfg)
        t0 = time.time()
        _alarm(3300)
        ref, stats = rollout_checkpoints(cfg, "slotted", st, max_chunk=20)
        print(json.dumps({"part": f"calm{n}", "backend": "slotted(pin)",
                          "r": cfg.bucket_resolution, **stats,
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)
        t0 = time.time()
        _alarm(3300)
        got, stats = rollout_checkpoints(cfg, "pallas", st, max_chunk=50)
        print(json.dumps({
            "part": f"calm{n}", "backend": "pallas",
            "rmse": {str(k): rmse(got[k], ref[k]) for k in CHECKPOINTS},
            **stats, "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)  # skip axon-plugin teardown (crashes the TPU worker)
