#!/usr/bin/env python
"""Isolate the v6 force kernel's per-chunk overhead: loop STRUCTURE vs
dynamic addressing vs VPU pair math.

A synthetic kernel replicates v6's inner-loop shape exactly (64-row
tiles, 16 tiles/group, (8,128) candidate chunks at dynamic VMEM rows,
6 accumulators, membership gate + full force pair math, interval table
in SMEM) on synthetic intervals matching the 262k golden statistics
(9 lines/tile, ~11 chunks/tile). Variants:

  A  nested fori (lines -> chunks), unroll 4, full math   [v6 replica]
  B  nested fori, math stripped to one masked madd        [VPU share]
  C  flat per-tile chunk list, STATIC unroll MAXC=16, gated, full math
  D  flat per-tile chunk list, ONE dynamic fori (unroll 4), full math
  E  nested fori, unroll 8, full math

Run: python scripts/probe_loopstruct_tpu.py tpu   (CPU interpret: no arg)
"""

import functools
import math
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
_PI = math.pi

LANES = 128
ROWS = 64
TPG = 16
N_WF = 8
W_ROWS = 97          # 262k golden force window rows (BENCH_NOTES)
GROUPS = 256         # 262k / 1024
N_LINES = 9
MAXC = 16
R = 47


def _decode_cell(cid, r):
    cz = jnp.floor((cid + 0.5) / (r * r))
    rem = cid - cz * (r * r)
    cy = jnp.floor((rem + 0.5) / r)
    cx = rem - cy * r
    return cx, cy, cz


def _pair_full(blk, lane_gate, rx, ry, rz, rvx, rvy, rvz, press_i, h, acc):
    cxl, cyl, czl = _decode_cell(blk[3:4, :], R)
    member = ((blk[3:4, :] >= 0.0)
              & (jnp.abs(cxl - rx * 0.0) <= 1.0)
              & (jnp.abs(cyl - ry * 0.0) <= 1.0)
              & (jnp.abs(czl - rz * 0.0) <= 1.0))
    gate = member.astype(jnp.float32) * lane_gate
    dxv = rx - blk[0:1, :]
    dyv = ry - blk[1:2, :]
    dzv = rz - blk[2:3, :]
    r2 = dxv * dxv + dyv * dyv + dzv * dzv
    rho_j = blk[7:8, :]
    rho_ok = rho_j > 1e-6
    inv_rho = jnp.where(rho_ok, 1.0, 0.0) / jnp.where(rho_ok, rho_j, 1.0)
    abs_r = jnp.sqrt(r2)
    rs = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    diff_r = h - abs_r
    valid = (diff_r > 1e-6) & (abs_r > 1e-6)
    h2 = h * h
    h6 = h2 * h2 * h2
    c_grad = jnp.float32(45.0 / _PI)
    gwp = jnp.where(valid, (c_grad / h6) * diff_r * diff_r * diff_r * rs,
                    0.0)
    gwv = jnp.where(abs_r < h, (c_grad / h6) * diff_r, 0.0)
    press_j = 150.0 * (rho_j - 1.5)
    pc = gate * (press_i + press_j) * 0.5 * inv_rho * gwp
    acc[0] = acc[0] + pc * dxv
    acc[1] = acc[1] + pc * dyv
    acc[2] = acc[2] + pc * dzv
    vc = gate * gwv * inv_rho
    acc[3] = acc[3] + vc * (blk[4:5, :] - rvx)
    acc[4] = acc[4] + vc * (blk[5:6, :] - rvy)
    acc[5] = acc[5] + vc * (blk[6:7, :] - rvz)
    return acc


def _pair_min(blk, lane_gate, rx, ry, rz, rvx, rvy, rvz, press_i, h, acc):
    acc[0] = acc[0] + blk[0:1, :] * lane_gate
    return acc


def kernel(variant, win_ref, tiles_ref, counts_ref, flat_ref, fcnt_ref,
           rows_ref, out_ref):
    h = jnp.float32(1.0 / (R - 1))
    pair = _pair_min if variant == "B" else _pair_full

    for rt in range(TPG):
        rows = rows_ref[rt]
        rx, ry, rz = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3]
        rvx, rvy, rvz = rows[:, 3:4], rows[:, 4:5], rows[:, 5:6]
        press_i = 150.0 * (rows[:, 6:7] - 1.5)
        n_acc = 1 if variant == "B" else 6
        acc = [jnp.zeros((ROWS, LANES), jnp.float32) for _ in range(n_acc)]

        def eval_chunk(ku, lg, acc):
            blk = win_ref[ku]
            return pair(blk, lg, rx, ry, rz, rvx, rvy, rvz, press_i, h,
                        acc)

        if variant in ("A", "B", "E"):
            unroll = 8 if variant == "E" else 4

            def line_body(i, acc):
                k0 = tiles_ref[rt, 2 * i]
                k1 = tiles_ref[rt, 2 * i + 1]

                def chunk_body(it, acc):
                    k = k0 + it * unroll
                    for u in range(unroll):
                        ku = jnp.minimum(k + u, W_ROWS - 1)
                        lg = ((k + u) < k1).astype(jnp.float32)
                        acc = eval_chunk(ku, lg, acc)
                    return acc

                n_it = jax.lax.div(k1 - k0 + (unroll - 1),
                                   jnp.int32(unroll))
                return jax.lax.fori_loop(0, n_it, chunk_body, acc,
                                         unroll=False)

            acc = jax.lax.fori_loop(0, counts_ref[rt, 0], line_body, acc,
                                    unroll=False)
        elif variant == "C":
            for j in range(MAXC):
                e = flat_ref[rt, j]
                lg = (e >= 0).astype(jnp.float32)
                ku = jnp.maximum(e, 0)
                acc = eval_chunk(ku, lg, acc)
        elif variant == "D":
            def flat_body(it, acc):
                k = it * 4
                for u in range(4):
                    j = jnp.minimum(k + u, MAXC - 1)
                    e = flat_ref[rt, j]
                    lg = ((k + u < fcnt_ref[rt, 0]) & (e >= 0)).astype(
                        jnp.float32)
                    acc = eval_chunk(jnp.maximum(e, 0), lg, acc)
                return acc

            n_it = jax.lax.div(fcnt_ref[rt, 0] + 3, jnp.int32(4))
            acc = jax.lax.fori_loop(0, n_it, flat_body, acc, unroll=False)

        sums = [jnp.sum(a, axis=1, keepdims=True) for a in acc]
        out_ref[rt] = jnp.concatenate(
            sums + [jnp.zeros((ROWS, 8 - len(sums)), jnp.float32)], axis=1)


def build_call(variant):
    k = functools.partial(kernel, variant)
    return pl.pallas_call(
        k,
        grid=(GROUPS,),
        in_specs=[
            pl.BlockSpec((W_ROWS, N_WF, LANES), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TPG, 2 * N_LINES), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TPG, 1), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TPG, MAXC), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TPG, 1), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TPG, ROWS, N_WF), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TPG, ROWS, 8), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GROUPS * TPG, ROWS, 8),
                                       jnp.float32),
        interpret=INTERP,
    )


def synth_inputs(rng):
    # per tile: 7 lines of 1 chunk + 2 lines of 2 chunks = 11 chunks
    T = GROUPS * TPG
    k0 = rng.randint(0, W_ROWS - 3, size=(T, N_LINES)).astype(np.int32)
    ln = np.ones((T, N_LINES), np.int32)
    ln[:, 3] = 2
    ln[:, 5] = 2
    k1 = k0 + ln
    tiles = np.stack([k0, k1], axis=-1).reshape(T, 2 * N_LINES)
    counts = np.full((T, 1), N_LINES, np.int32)
    flat = np.full((T, MAXC), -1, np.int32)
    for i in range(N_LINES):       # expand intervals to flat chunk lists
        pass
    pos = np.zeros(T, np.int32)
    flat_list = np.full((T, MAXC), -1, np.int32)
    for i in range(N_LINES):
        for d in range(2):
            sel = ln[:, i] > d
            idx = np.clip(pos, 0, MAXC - 1)
            flat_list[np.arange(T)[sel], idx[sel]] = k0[sel, i] + d
            pos = pos + sel.astype(np.int32)
    fcnt = pos[:, None].astype(np.int32)
    win = rng.rand(W_ROWS, N_WF, LANES).astype(np.float32)
    win[:, 3, :] = rng.randint(0, R ** 3, size=(W_ROWS, LANES))
    rows = rng.rand(GROUPS * TPG, ROWS, N_WF).astype(np.float32)
    return (jnp.asarray(win), jnp.asarray(tiles), jnp.asarray(counts),
            jnp.asarray(flat_list), jnp.asarray(fcnt), jnp.asarray(rows))


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (print("ALARM", flush=True), os._exit(9)))
    signal.alarm(1800)
    rng = np.random.RandomState(0)
    win, tiles, counts, flat, fcnt, rows = synth_inputs(rng)
    iters = 2 if INTERP else 30
    chunks_per_tile = 11.0

    for variant in ("A", "B", "C", "D", "E"):
        call = build_call(variant)

        @jax.jit
        def run(rows, win):
            def body(c, _):
                out = call(win, tiles, counts, flat, fcnt, c)
                # chain the output into the next iteration's rows so XLA
                # cannot hoist or DCE the loop body
                return c + out[:, :, 0:1] * 1e-30, ()

            c, _ = jax.lax.scan(body, rows, None, length=iters)
            return c

        out = run(rows, win)
        jax.block_until_ready(out)
        t0 = time.time()
        out = run(rows, win)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        per_chunk = dt / (GROUPS * TPG * chunks_per_tile)
        print(f"variant {variant}: {dt*1e3:.3f} ms/pass "
              f"({per_chunk*1e9:.0f} ns/chunk-equiv)", flush=True)

    if not INTERP:
        sys.stdout.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
