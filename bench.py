#!/usr/bin/env python
"""Driver benchmark entry: ALWAYS prints ONE JSON line, within a deadline.

Measures particle-substeps/sec/chip on the canonical dam-break (the
reference's only shipped workload, scaled per BASELINE.md).

Budget discipline (round-5 redesign after BENCH_r03 rc=124 and BENCH_r04
value 0.0): the driver kills this process at an unknown wall timeout, so
the script runs under ONE global deadline (SPH_BENCH_DEADLINE, default
840 s) and banks results incrementally:

  1. TPU recovery wait — NEVER surrenders while deadline remains: it
     retries fresh (cache-busted) Mosaic compiles until the worker
     answers or fewer than RECOVERY_FLOOR seconds remain (the round-4
     fixed 240 s cap gave up with ~575 s still unspent — VERDICT r4)
  2. BANKING stage: 262k x 10 frames — a number in hand in minutes
  3. headline stage: 1M x 20 frames (comparable to BENCH_r01-r03)
  4. steady-state window at 1M (roll deeper, time a late window)
  5. 2M ladder attempt (BASELINE metric range is 64k-4M)

Recovery is re-attempted between stages after any stage failure. At the
deadline (or when all stages have run), the best banked result is
printed and the process exits 0. A stage is never armed with more time
than remains before the deadline.

If the worker stays dead for the whole window, the artifact is still
never 0.0: the last committed builder-run result (BENCH_LOCAL.json,
written by `python bench.py --save-local` during the build round) is
emitted with ``"unverified_fallback": true`` and explicit provenance —
an unverified number with honest labeling beats a 0.0 (VERDICT r4
next-round item 1).
"""

import json
import os
import signal
import sys
import time
import traceback

T0 = time.time()
DEADLINE = float(os.environ.get("SPH_BENCH_DEADLINE", "840"))
MARGIN = 25.0  # seconds reserved for the final print + exit
RECOVERY_FLOOR = 90.0  # keep retrying recovery until this little remains
LOCAL_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json")


class _StageTimeout(Exception):
    pass


def _remaining() -> float:
    return DEADLINE - (time.time() - T0) - MARGIN


def _arm(seconds: float) -> bool:
    """Arm SIGALRM for min(seconds, time-to-deadline); False if no time.

    In-flight axon dispatches hang forever when the TPU worker crashes;
    the alarm turns the hang into a fallback instead of an rc=124.
    """
    budget = min(float(seconds), _remaining())
    if budget <= 1.0:
        return False

    def on_alarm(*a):
        raise _StageTimeout("stage timed out")

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(max(1, int(budget)))
    return True


def _disarm() -> None:
    signal.alarm(0)


_PROBE_PLAIN = (
    "import jax, jax.numpy as jnp;"
    "assert float(jnp.sum(jnp.ones(8))) == 8.0;"
    "import os; os._exit(0)")

# The cache-buster rides as an INPUT: this jax version rejects kernels
# that close over traced constants at TRACE time ("captures constants
# ... pass them as inputs"), which made the round-4 closure-form probe
# fail INSTANTLY every attempt — the recovery loop could never succeed
# and burned the whole deadline (the real cause behind BENCH_r04's 0.0).
_PROBE_PALLAS = """
import time, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
c = jnp.full((1, 1), (int(time.time()) % 100000), jnp.float32)
def _k(c_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...] + c_ref[0, 0]
f = pl.pallas_call(_k, out_shape=jax.ShapeDtypeStruct((8, 128),
                                                      jnp.float32))
y = float(jnp.sum(f(c, jnp.ones((8, 128), jnp.float32))))
assert y == y
import os; os._exit(0)
"""


def _probe(code: str, budget: float) -> tuple[bool, str]:
    """Run a TPU probe in a SUBPROCESS bounded by ``budget`` seconds.

    In-process probes cannot be bounded: when the tunneled worker hangs,
    the axon RPC blocks in native code and SIGALRM handlers never run
    (measured this round — a 330 s alarm slept through a 9-minute hang).
    A child process is killable regardless of native state, and a hung
    dispatch poisons only the child."""
    import subprocess
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=max(5.0, budget), capture_output=True)
        if r.returncode == 0:
            return True, "ok"
        tail = (r.stderr or b"")[-200:].decode("utf-8", "replace")
        return False, f"rc={r.returncode}: {tail}"
    except subprocess.TimeoutExpired:
        return False, "probe subprocess timed out"
    except Exception as e:  # noqa: BLE001
        return False, f"{type(e).__name__}: {e}"


def _wait_tpu_recovery(max_wait: float | None = None) -> bool:
    """Wait for the TPU worker; True once a FRESH (cache-busted) Mosaic
    compile succeeds in a probe subprocess (plain dispatches recover
    before the remote tpu_compile_helper fleet does, and a broken helper
    500s every real pallas compile while ``jnp.sum`` happily runs).

    With ``max_wait=None`` this NEVER gives up while more than
    RECOVERY_FLOOR seconds remain before the deadline — the worker
    recovery takes ~30-40 min worst case and the round-4 fixed cap
    surrendered with most of the budget unspent. A healthy fresh Mosaic
    mini-compile takes ~200 s on a busy tunnel, so the pallas probe gets
    330 s; after two full-length pallas-probe failures with plain
    dispatches answering, proceed optimistically — the stages arm their
    own alarms, and recovery re-runs between stages on failure anyway.
    """
    t0 = time.time()
    attempt = 0
    probe_timeouts = 0
    while _remaining() > RECOVERY_FLOOR:
        if max_wait is not None and time.time() - t0 >= max_wait:
            return False
        ta = time.time()
        plain_ok, why = _probe(_PROBE_PLAIN, min(120, _remaining()))
        if not plain_ok:
            print(f"recovery[{attempt}] plain check failed after "
                  f"{time.time() - ta:.0f}s: {why[:160]}",
                  file=sys.stderr, flush=True)
            attempt += 1
            time.sleep(min(20.0, max(1.0, _remaining() - 5)))
            continue
        ta = time.time()
        ok, why = _probe(_PROBE_PALLAS, min(330, _remaining()))
        if ok:
            return True
        print(f"recovery[{attempt}] pallas probe failed after "
              f"{time.time() - ta:.0f}s: {why[:160]}",
              file=sys.stderr, flush=True)
        attempt += 1
        probe_timeouts += 1
        if probe_timeouts >= 2:
            print("recovery: plain dispatch OK, pallas probe failed "
                  "twice; proceeding optimistically",
                  file=sys.stderr, flush=True)
            return True
        time.sleep(min(10.0, max(1.0, _remaining() - 5)))
    return False


def _load_local_cache() -> dict | None:
    try:
        with open(LOCAL_CACHE) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001
        return None


def _emit(best: dict | None, last_err: str | None) -> None:
    if best is None:
        cached = _load_local_cache()
        if cached is not None and cached.get("value"):
            best = dict(cached)
            best["unverified_fallback"] = True
            best["provenance"] = (
                "builder-run result cached in BENCH_LOCAL.json "
                f"(measured {cached.get('measured_at', 'unknown date')}); "
                "live driver capture failed this run: "
                + (last_err or "no stage completed within deadline"))
        else:
            best = {
                "metric": ("particle-substeps/sec/chip "
                           "(dam-break, faithful mode)"),
                "value": 0.0,
                "unit": "particle-substeps/s",
                "vs_baseline": 0.0,
                "error": last_err or "no stage completed within deadline",
            }
    best["bench_wall_s"] = round(time.time() - T0, 1)
    print(json.dumps(best), flush=True)
    os._exit(0)  # skip axon teardown (can crash the TPU worker)


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    save_local = "--save-local" in sys.argv

    best: dict | None = None
    banked: dict[str, dict] = {}
    last_err: str | None = None

    # Hard backstop: whatever happens, print before the deadline. SIGALRM
    # is re-armed per stage below; this initial arm covers the imports and
    # backend init, which themselves hang when the tunnel is down.
    try:
        if not _arm(_remaining()):
            _emit(None, "no time at start")
        from sphfluidsimulation_tpu.bench import run_bench
        from sphfluidsimulation_tpu.utils.compcache import (
            enable_compilation_cache)
        enable_compilation_cache()
        _disarm()
    except Exception as e:  # noqa: BLE001
        _disarm()
        _emit(None, f"import/init: {type(e).__name__}: {e}")

    if not _wait_tpu_recovery():
        _emit(None, "TPU worker did not answer before the deadline "
                    f"(waited {round(time.time() - T0)} s)")

    # (name, kwargs, stage_budget_s). Ordered cheapest-first so a number
    # is banked early; later stages only improve the artifact.
    # headline_1m appears twice: the tunneled worker dies in ~10-20 min
    # cycles (measured round 5), and a stage that hangs mid-window must
    # not cost the flagship number its only shot — the retry entry is
    # skipped when the first attempt banked.
    stages = (
        ("bank_262k", dict(n_particles=1 << 18, frames=10, warmup_frames=3,
                           neighbor="pallas"), 330),
        ("headline_1m", dict(n_particles=1 << 20, frames=20, warmup_frames=5,
                             neighbor="pallas"), 420),
        ("steady_1m", dict(n_particles=1 << 20, frames=20, warmup_frames=5,
                           neighbor="pallas", steady_frames=80), 420),
        ("ladder_2m", dict(n_particles=1 << 21, frames=10, warmup_frames=3,
                           neighbor="pallas"), 360),
        ("headline_1m", dict(n_particles=1 << 20, frames=20, warmup_frames=5,
                             neighbor="pallas"), 300),
    )
    for si, (name, kwargs, budget) in enumerate(stages):
        if _remaining() < 60:
            break
        if name in banked:
            continue
        # the steady-state stage rides on the headline stage's success;
        # don't attempt it cold after a headline failure
        if name == "steady_1m" and "headline_1m" not in banked:
            continue
        try:
            if not _arm(budget):
                break
            result = run_bench(**kwargs)
            _disarm()
            banked[name] = result
        except Exception as e:  # noqa: BLE001
            _disarm()
            last_err = f"{name}: {type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)
            # re-attempt worker recovery before EVERY remaining stage —
            # uncapped: recovery keeps retrying while > RECOVERY_FLOOR s
            # remain, and each later stage still checks its own budget
            if si != len(stages) - 1 and not _wait_tpu_recovery():
                break

    # Headline preference: the 1M spawn-window number (comparable to
    # r01-r03), annotated with whatever else was banked.
    best = (banked.get("headline_1m") or banked.get("bank_262k")
            or banked.get("ladder_2m"))
    if best is not None:
        if "steady_1m" in banked:
            s = banked["steady_1m"]
            best["steady_state_value"] = s.get("steady_state_value")
            best["steady_state_frames_window"] = s.get(
                "steady_state_frames_window")
        if "ladder_2m" in banked:
            best["ladder_2m_value"] = banked["ladder_2m"]["value"]
        if "bank_262k" in banked and best.get("n_particles") != (1 << 18):
            best["value_262k"] = banked["bank_262k"]["value"]
        best["stages_completed"] = sorted(banked)
        if last_err:
            best["last_stage_error"] = last_err
        if save_local:
            # builder-side cache: commit this file so a dead worker at
            # driver time still yields a nonzero, provenance-marked number
            local = dict(best)
            local["measured_at"] = time.strftime("%Y-%m-%d %H:%M UTC",
                                                 time.gmtime())
            with open(LOCAL_CACHE, "w") as f:
                json.dump(local, f, indent=1)
    _emit(best, last_err)
    return 0


if __name__ == "__main__":
    sys.exit(main())
