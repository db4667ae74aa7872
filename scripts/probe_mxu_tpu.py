#!/usr/bin/env python
"""Evaluate an MXU formulation of the force pair math (VERDICT r2 item 1).

The v8 force kernel is VPU + scalar-core bound: ~210 ns per (64, 128)
candidate chunk, of which ~88 ns is loop structure and ~120 ns is the
~55-op VPU pair math (scripts/probe_loopstruct_tpu.py). The MXU idea:

  * r^2 = |x_i|^2 + |x_j|^2 - 2 x_i . x_j  — the Gram term is a
    [ROWS, 3] @ [3, 128] matmul;
  * the six per-component accumulates (pc*dx, vc*dv — 18 VPU ops of
    mul+add+select per chunk) become TWO matmuls against ones-augmented
    candidate blocks:  Fp[ROWS, 4] += PC[ROWS, 128] @ [xj yj zj 1]^T and
    Fv[ROWS, 4] += VC @ [vjx vjy vjz 1]^T, using
      sum_j pc_ij (x_i - x_j) = x_i * (sum_j pc_ij) - (PC @ Xj)_i
    (the ones column carries sum_j pc_ij). This also shrinks the live
    accumulators from 6x(ROWS, 128) f32 to 2x(ROWS, 4) — less register
    pressure for Mosaic's software pipeline.

The rearrangement changes float semantics: x_i * sum(pc) - sum(pc x_j)
cancels ~log2(1/h) ~ 5-6 bits where the direct form subtracts first.
The probe measures BOTH wall time and the numeric divergence vs the
direct walk on golden-statistics synthetic data.

Variants (all flat-worklist walks, matching the shipped v8 structure):

  D     direct VPU pair math, ROWS=64          [v8 replica, baseline]
  G     D + Gram-matmul r^2 (VPU accumulates)  [attribution: r^2 alone]
  A     direct VPU r^2 + MXU accumulates only  [no Gram cancellation]
  M     full MXU offload (Gram + accumulates), ROWS=64
  D128  direct, ROWS=128 (fewer, taller chunks)
  A128  accumulate-offload, ROWS=128
  M128  full MXU offload, ROWS=128

Interpret-mode numeric finding (recorded here so the TPU run is purely
perf): the Gram r^2 is DISQUALIFIED for faithful mode — r^2 near zero is
computed as a difference of O(1) terms, so near-coincident pairs (which
the dam-break produces and whose gwp ~ 1/r terms are enormous) come out
with O(1e9) relative error. The accumulate-only offload (A) keeps r^2
exact and loses only ~log2(1/h) bits to the x_i*sum(pc) - sum(pc x_j)
rearrangement, measured below as scale-relative error.

Run: python scripts/probe_mxu_tpu.py tpu    (CPU interpret: no arg)
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
N_WF = 8
W_ROWS = 97          # 262k golden force window rows (BENCH_NOTES)
N_PART = 1 << 18     # 262k
R = 47
H = 1.0 / (R - 1)
MAXC = 16


def _decode_cell(cid, r):
    cz = jnp.floor((cid + 0.5) / (r * r))
    rem = cid - cz * (r * r)
    cy = jnp.floor((rem + 0.5) / r)
    cx = rem - cy * r
    return cx, cy, cz


def kernel(variant, rows_n, tpg, win_ref, flat_ref, fcnt_ref, rows_ref,
           out_ref):
    h = jnp.float32(H)
    h2 = h * h
    h6 = h2 * h2 * h2
    c_grad = jnp.float32(45.0 / _PI)
    mxu = variant.startswith("M") or variant.startswith("A")
    gram = variant.startswith("M") or variant == "G"

    for rt in range(tpg):
        rows = rows_ref[rt]
        rx, ry, rz = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3]
        rvx, rvy, rvz = rows[:, 3:4], rows[:, 4:5], rows[:, 5:6]
        press_i = 150.0 * (rows[:, 6:7] - 1.5)
        # fresh cells of the i-side (synthetic: derived from positions the
        # same way the real kernel does)
        def _trunc(v):
            return v.astype(jnp.int32).astype(jnp.float32)

        fx = _trunc(rx * (R - 1.0))
        fy = _trunc(ry * (R - 1.0))
        fz = _trunc(rz * (R - 1.0))
        if gram:
            xi = rows[:, 0:3]                         # (ROWS, 3)
            nrm_i = rx * rx + ry * ry + rz * rz       # (ROWS, 1)

        if mxu:
            acc = [jnp.zeros((rows_n, 4), jnp.float32),
                   jnp.zeros((rows_n, 4), jnp.float32)]
        else:
            acc = [jnp.zeros((rows_n, LANES), jnp.float32)
                   for _ in range(6)]

        def pair_block(blk, lane_gate, acc):
            cxl, cyl, czl = _decode_cell(blk[3:4, :], R)
            occ = blk[3:4, :] >= 0.0
            member = (occ
                      & (jnp.abs(cxl - fx) <= 1.0)
                      & (jnp.abs(cyl - fy) <= 1.0)
                      & (jnp.abs(czl - fz) <= 1.0))
            gate = member & lane_gate

            if gram:
                nrm_j = (blk[0:1, :] * blk[0:1, :]
                         + blk[1:2, :] * blk[1:2, :]
                         + blk[2:3, :] * blk[2:3, :])      # (1, 128)
                g2 = jax.lax.dot_general(
                    xi, blk[0:3, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (ROWS, 128)
                r2 = jnp.maximum(nrm_i + nrm_j - 2.0 * g2, 0.0)
            if not mxu:
                # VPU accumulates need the displacement components
                dxv = rx - blk[0:1, :]
                dyv = ry - blk[1:2, :]
                dzv = rz - blk[2:3, :]
            elif not gram:
                dxv = rx - blk[0:1, :]
                dyv = ry - blk[1:2, :]
                dzv = rz - blk[2:3, :]
            if not gram:
                r2 = dxv * dxv + dyv * dyv + dzv * dzv

            rho_j = blk[7:8, :]
            rho_ok = rho_j > 1e-6
            inv_rho = jnp.where(rho_ok, 1.0, 0.0) / jnp.where(
                rho_ok, rho_j, 1.0)
            abs_r = jnp.sqrt(r2)
            rs = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
            diff_r = h - abs_r
            valid = (diff_r > 1e-6) & (abs_r > 1e-6)
            gwp = jnp.where(valid,
                            (c_grad / h6) * diff_r * diff_r * diff_r * rs,
                            0.0)
            gwv = jnp.where(abs_r < h, (c_grad / h6) * diff_r, 0.0)
            press_j = 150.0 * (rho_j - 1.5)
            pc = jnp.where(gate, (press_i + press_j) * 0.5 * inv_rho * gwp,
                           0.0)
            vc = jnp.where(gate, gwv * inv_rho, 0.0)

            if mxu:
                # ones-augmented candidate blocks: [xj yj zj 1], [vj 1];
                # contraction over the LANE axis of both operands (NT
                # matmul — no explicit transpose materialized)
                ones = jnp.ones((1, LANES), jnp.float32)
                xj4 = jnp.concatenate([blk[0:3, :], ones], axis=0)
                vj4 = jnp.concatenate([blk[4:7, :], ones], axis=0)
                acc[0] = acc[0] + jax.lax.dot_general(
                    pc, xj4, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc[1] = acc[1] + jax.lax.dot_general(
                    vc, vj4, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                acc[0] = acc[0] + pc * dxv
                acc[1] = acc[1] + pc * dyv
                acc[2] = acc[2] + pc * dzv
                acc[3] = acc[3] + vc * (blk[4:5, :] - rvx)
                acc[4] = acc[4] + vc * (blk[5:6, :] - rvy)
                acc[5] = acc[5] + vc * (blk[6:7, :] - rvz)
            return acc

        def flat_body(it, acc):
            k = it * 4
            for u in range(4):
                j = jnp.minimum(k + u, MAXC - 1)
                e = flat_ref[rt, j]
                lg = (k + u < fcnt_ref[rt, 0]) & (e >= 0)
                acc = pair_block(win_ref[jnp.maximum(e, 0)], lg, acc)
            return acc

        n_it = jax.lax.div(fcnt_ref[rt, 0] + 3, jnp.int32(4))
        acc = jax.lax.fori_loop(0, n_it, flat_body, acc, unroll=False)

        if mxu:
            # f = x_i * sum(pc) - (PC @ Xj) ; v-term analogous
            spc = acc[0][:, 3:4]
            svc = acc[1][:, 3:4]
            fpx = rx * spc - acc[0][:, 0:1]
            fpy = ry * spc - acc[0][:, 1:2]
            fpz = rz * spc - acc[0][:, 2:3]
            fvx = acc[1][:, 0:1] - rvx * svc
            fvy = acc[1][:, 1:2] - rvy * svc
            fvz = acc[1][:, 2:3] - rvz * svc
            sums = [fpx, fpy, fpz, fvx, fvy, fvz]
        else:
            sums = [jnp.sum(a, axis=1, keepdims=True) for a in acc]
        out_ref[rt] = jnp.concatenate(
            sums + [jnp.zeros((rows_n, 8 - len(sums)), jnp.float32)],
            axis=1)


def build_call(variant, rows_n):
    tpg = 1024 // rows_n          # keep the 1024-particle group geometry
    groups = N_PART // 1024
    k = functools.partial(kernel, variant, rows_n, tpg)
    return pl.pallas_call(
        k,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((W_ROWS, N_WF, LANES), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpg, MAXC), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tpg, 1), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tpg, rows_n, N_WF), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tpg, rows_n, 8), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups * tpg, rows_n, 8),
                                       jnp.float32),
        interpret=INTERP,
    )


def synth_inputs(rng, rows_n):
    """Golden-statistics synthetic data: plausible positions/cells so the
    membership gate passes at a realistic (~5%) rate and the pair math
    sees support-scale distances."""
    tpg = 1024 // rows_n
    T = (N_PART // 1024) * tpg
    # ~11 chunks per 64 rows; scale with tile height
    n_chunks = max(4, int(round(11 * rows_n / 64.0)))
    maxc = MAXC
    k0 = rng.randint(0, W_ROWS - 1, size=(T, maxc)).astype(np.int32)
    flat_list = np.full((T, maxc), -1, np.int32)
    flat_list[:, :n_chunks] = k0[:, :n_chunks]
    fcnt = np.full((T, 1), n_chunks, np.int32)

    win = np.zeros((W_ROWS, N_WF, LANES), np.float32)
    pos_j = rng.rand(W_ROWS, LANES, 3).astype(np.float32)
    win[:, 0:3, :] = np.transpose(pos_j, (0, 2, 1))
    cell_j = np.minimum((pos_j * (R - 1)).astype(np.int64), R - 1)
    cid_j = cell_j[..., 0] + cell_j[..., 1] * R + cell_j[..., 2] * R * R
    win[:, 3, :] = cid_j.astype(np.float32)
    win[:, 4:7, :] = rng.randn(W_ROWS, 3, LANES).astype(np.float32) * 0.1
    win[:, 7, :] = (1.0 + rng.rand(W_ROWS, LANES)).astype(np.float32)

    rows = np.zeros((T, rows_n, N_WF), np.float32)
    rows[:, :, 0:3] = rng.rand(T, rows_n, 3).astype(np.float32)
    rows[:, :, 3:6] = rng.randn(T, rows_n, 3).astype(np.float32) * 0.1
    rows[:, :, 6] = (1.0 + rng.rand(T, rows_n)).astype(np.float32)
    return (jnp.asarray(win), jnp.asarray(flat_list), jnp.asarray(fcnt),
            jnp.asarray(rows))


def run_variant(variant, rows_n, inputs, iters):
    win, flat, fcnt, rows = inputs
    call = build_call(variant, rows_n)

    @jax.jit
    def run(rows, win):
        def body(c, _):
            out = call(win, flat, fcnt, c)
            return c + out[:, :, 0:1] * 1e-30, ()

        c, _ = jax.lax.scan(body, rows, None, length=iters)
        return c

    out = run(rows, win)
    jax.block_until_ready(out)
    t0 = time.time()
    out = run(rows, win)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    one = jax.jit(lambda rows, win: call(win, flat, fcnt, rows))(rows, win)
    return dt, np.asarray(one)


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (print("ALARM", flush=True), os._exit(9)))
    signal.alarm(2400)
    rng = np.random.RandomState(0)
    iters = 2 if INTERP else 30
    results = {}
    inputs64 = synth_inputs(rng, 64)
    inputs128 = synth_inputs(np.random.RandomState(0), 128)

    for variant, rows_n, inputs in (
            ("D", 64, inputs64), ("G", 64, inputs64), ("A", 64, inputs64),
            ("M", 64, inputs64), ("D128", 128, inputs128),
            ("A128", 128, inputs128), ("M128", 128, inputs128)):
        dt, out = run_variant(variant, rows_n, inputs, iters)
        n_chunks = max(4, int(round(11 * rows_n / 64.0)))
        tiles = (N_PART // 1024) * (1024 // rows_n)
        per_chunk = dt / (tiles * n_chunks)
        results[variant] = (dt, out)
        print(f"variant {variant:5s}: {dt*1e3:7.3f} ms/pass "
              f"({per_chunk*1e9:5.0f} ns/chunk, rows={rows_n})", flush=True)

    # numeric divergence of the MXU rearrangements vs the direct walk:
    # per-element relative AND scale-relative (relative to the component's
    # max magnitude — the meaningful number for trajectory divergence)
    for a, b in (("D", "G"), ("D", "A"), ("D", "M"), ("D128", "A128"),
                 ("D128", "M128")):
        if results[a][1].shape == results[b][1].shape:
            oa = results[a][1][:, :, 0:6]
            ob = results[b][1][:, :, 0:6]
            denom = np.maximum(np.abs(oa), 1e-12)
            rel = np.abs(oa - ob) / denom
            scale = np.max(np.abs(oa))
            print(f"{a} vs {b}: max abs diff {np.max(np.abs(oa - ob)):.3e}"
                  f"  max rel (|ref|>1e-6) "
                  f"{np.max(np.where(np.abs(oa) > 1e-6, rel, 0)):.3e}"
                  f"  scale-rel {np.max(np.abs(oa - ob)) / scale:.3e}",
                  flush=True)

    sys.stdout.flush()
    if not INTERP:
        os._exit(0)


if __name__ == "__main__":
    main()
