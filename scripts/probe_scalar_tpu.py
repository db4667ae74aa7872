#!/usr/bin/env python
"""Cost of Mosaic SCALAR-ONLY work per tile: decides whether the v9
"in-kernel interval derivation" design (per-tile scalar prologue: 9 SMEM
line lookups + ~11 dynamic SMEM worklist stores) can beat the XLA-side
fresh-interval gathers (~2.1 ms @262k, ~11 ms @1M per substep).

Variants (all over GROUPS=256 grid steps x TPG=16 tiles, like the real
kernel, with a tiny vector payload so the scalar core is the critical
path):

  S0  baseline: vector payload only (one madd per tile)
  S1  + 9 static scalar SMEM reads/clamps per tile (line lookups)
  S2  + 9 dynamic-trip scalar fori_loops per tile (~11 iters total,
      one SMEM store each) — the worklist build
  S3  + one flat dynamic fori (~11 iters) reading the worklist back and
      indexing a VMEM block with it — the walk address dependency

Run: python scripts/probe_scalar_tpu.py tpu   (CPU interpret: no arg)
"""

import functools
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = "tpu" not in sys.argv
LANES = 128
TPG = 16
GROUPS = 256
MAXC = 16
S_SLICE = 2048


def kernel(variant, slc_in_ref, spans_ref, x_ref, out_ref, wl, slc, sem):
    cp = pltpu.make_async_copy(slc_in_ref.at[pl.ds(0, S_SLICE)], slc, sem)
    cp.start()
    cp.wait()

    for rt in range(TPG):
        acc = x_ref[rt] * 1.000001

        if variant >= 1:
            lo = spans_ref[rt, 0]
            hi = spans_ref[rt, 1]
            prev_b = jnp.int32(0)
            cnt = jnp.int32(0)
            bounds = []
            for line in range(9):
                qa = jnp.clip(lo + line * 7, 0, S_SLICE - 1)
                qb = jnp.clip(hi + line * 7 + 2, 0, S_SLICE - 1)
                a = slc[qa]
                b = slc[qb]
                a = jnp.maximum(a, prev_b)
                b = jnp.maximum(b, a)
                prev_b = b
                k0 = jax.lax.div(a, jnp.int32(LANES))
                k1 = jax.lax.div(b + LANES - 1, jnp.int32(LANES))
                k1 = jnp.minimum(k1, k0 + 2)
                bounds.append((k0, k1))

            if variant >= 2:
                for k0, k1 in bounds:
                    def wbody(i, cnt, k0=k0):
                        wl[jnp.minimum(cnt, MAXC - 1)] = k0 + i
                        return cnt + 1

                    cnt = jax.lax.fori_loop(0, jnp.minimum(k1 - k0, 2),
                                            wbody, cnt, unroll=False)

            if variant >= 3:
                def walk(it, acc):
                    e = wl[jnp.minimum(it, MAXC - 1)]
                    blk = x_ref[jax.lax.rem(e, TPG)]
                    return acc + blk * 1e-30

                acc = jax.lax.fori_loop(0, jnp.minimum(cnt, MAXC), walk,
                                        acc, unroll=False)
            else:
                acc = acc + bounds[0][0].astype(jnp.float32) * 1e-30
                if variant >= 2:
                    acc = acc + cnt.astype(jnp.float32) * 1e-30

        out_ref[rt] = acc


def build(variant):
    k = functools.partial(kernel, variant)
    return pl.pallas_call(
        k,
        grid=(GROUPS,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TPG, 2), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TPG, 8, LANES), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TPG, 8, LANES), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GROUPS * TPG, 8, LANES),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((MAXC,), jnp.int32),
            pltpu.SMEM((S_SLICE,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERP,
    )


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (print("ALARM", flush=True), os._exit(9)))
    signal.alarm(1500)
    rng = np.random.RandomState(0)
    slc_in = jnp.asarray(np.sort(rng.randint(0, 1 << 14, S_SLICE))
                         .astype(np.int32))
    spans = jnp.asarray(
        rng.randint(0, S_SLICE - 100, (GROUPS * TPG, 2)).astype(np.int32))
    spans = spans.at[:, 1].set(spans[:, 0] + 3)
    x = jnp.asarray(rng.rand(GROUPS * TPG, 8, LANES).astype(np.float32))
    iters = 2 if INTERP else 50

    for variant in (0, 1, 2, 3):
        call = build(variant)

        @jax.jit
        def run(x):
            def body(c, _):
                return call(slc_in, spans, c) * (1.0 - 1e-30), ()

            c, _ = jax.lax.scan(body, x, None, length=iters)
            return c

        out = run(x)
        jax.block_until_ready(out)
        t0 = time.time()
        out = run(x)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        per_tile = dt / (GROUPS * TPG)
        print(f"S{variant}: {dt*1e3:.3f} ms/pass ({per_tile*1e9:.0f} "
              f"ns/tile)", flush=True)

    if not INTERP:
        sys.stdout.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
