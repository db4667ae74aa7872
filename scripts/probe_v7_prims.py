#!/usr/bin/env python
"""Probe the Mosaic primitives the v7 compact-lane kernel design needs.

1. pltpu.roll with a DYNAMIC (traced scalar) lane shift on (8, 128) f32.
2. A large-ish SMEM scratch (16k i32) filled by an HBM->SMEM async copy.
3. Scalar reads from that SMEM scratch driving dynamic VMEM row loads.

Run with no args: CPU interpret mode. With 'tpu': compiled on the real
chip (exits via os._exit(0) -- tunneled-worker teardown crash, see
BENCH_NOTES.md "Operational gotcha").
"""

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = "tpu" not in sys.argv
S_SLICE = 1 << 14


def kernel(off_ref, x_ref, table_ref, out_ref, smem, sem):
    # --- 2: HBM -> SMEM DMA of a dynamic slice of the start table ---
    # 1-D i32 HBM refs are tiled (1024): the dynamic offset must be a
    # proven multiple of 1024 (pl.multiple_of + caller-side alignment)
    off = pl.multiple_of(off_ref[0], 1024)
    cp = pltpu.make_async_copy(
        table_ref.at[pl.ds(off, S_SLICE)], smem, sem)
    cp.start()
    cp.wait()

    # --- 3: scalar read from SMEM -> dynamic row index into VMEM ---
    row = smem[7]            # = 3 in the test data
    blk = x_ref[pl.ds(row, 8), :]          # (8, 128) at dynamic row

    # --- 1: dynamic lane roll by a traced scalar ---
    sh = smem[11]            # = 37
    out_ref[0:8, :] = pltpu.roll(blk, shift=sh, axis=1)
    # funnel merge: take lanes < t from rolled, else from a second roll
    blk2 = x_ref[pl.ds(row + 8, 8), :]
    r2 = pltpu.roll(blk2, shift=sh, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_ref[8:16, :] = jnp.where(lane < sh, r2, out_ref[0:8, :])


def main():
    signal.alarm(420)
    x = jnp.asarray(np.random.RandomState(0).rand(64, 128), jnp.float32)
    table = jnp.arange(1 << 16, dtype=jnp.int32) % 16  # small values: safe rows
    off = jnp.array([1024], jnp.int32)

    fn = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((S_SLICE,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        interpret=INTERP,
    )
    out = np.asarray(jax.jit(fn)(off, x, table))

    # expectations: smem[7] = table[1031] = 107 -> row=107 is out of range of
    # x (64 rows)! use modest numbers instead: table[107] = 107... so build
    # expectations from the actual semantics:
    row = 107 % 64 if False else 107  # see note below
    # NOTE: row 107 > 64 would be OOB; table holds arange so smem[7]=107.
    # To keep the probe honest we validate against numpy with the same
    # (clamped-by-hardware-undefined) indices only when in range; redo with
    # a table whose values are small:
    assert out.shape == (16, 128)
    print("probe A (shapes/compile): OK")

    table2 = jnp.full((1 << 16,), 3, jnp.int32)
    table2 = table2.at[1035].set(37)  # smem[11] = table[1024+11]
    out2 = np.asarray(jax.jit(fn)(off, x, table2))
    xb = np.asarray(x)
    exp_top = np.roll(xb[3:11], 37, axis=1)
    np.testing.assert_array_equal(out2[0:8], exp_top)
    exp2 = np.roll(xb[11:19], 37, axis=1)
    lane = np.arange(128)[None, :]
    exp_bot = np.where(lane < 37, exp2, exp_top)
    np.testing.assert_array_equal(out2[8:16], exp_bot)
    print("probe B (dynamic roll + funnel + SMEM DMA + scalar read): OK")
    return 0


if __name__ == "__main__":
    rc = main()
    if "tpu" in sys.argv:
        sys.stdout.flush()
        os._exit(rc)
    sys.exit(rc)
