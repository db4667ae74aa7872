"""v7 "compact-lane" Pallas SPH kernels: dense pair lanes via in-kernel
candidate compaction.

The v6 kernel (ops/pallas_sph.py) walks each row-tile's candidate lines as
whole 128-lane chunks of the sorted array; at golden occupancy (~2.5
particles/cell) a 64-row tile spans ~25 cells, so each chunk is relevant
to only the few rows whose 27-cell window (Density.compute:42-52,
VelPos.compute:67-81) intersects it — measured pair-lane utilization ~5%
(BENCH_NOTES.md "Roofline / utilization honesty"). v7 closes that gap:

* **Per-line lane compaction.** For each row-tile, the nine (dy, dz) ∈
  [-1,1]² candidate line segments (contiguous ranges of the sorted array)
  are funnel-merged into a DENSE compact buffer using dynamic lane
  rotates (`pltpu.roll`) and masked merges — no gathers, no extra HBM
  traffic. Pair math then runs on ~3 dense chunks instead of ~11 sparse
  ones (3-5x fewer evaluated pair lanes at golden occupancy).
* **In-kernel interval derivation.** The per-(tile, line) sorted ranges
  come from scalar lookups into a per-group slice of the cell-start table
  DMA'd into SMEM — replacing the per-substep XLA gather table
  (fresh_force_intervals: ~11 ms x 5/frame at 1M, start[] gathers at
  ~37 ns/element) with two SMEM reads per line.
* **Monotone dedup, exact membership.** Line offsets increase strictly
  with (dz, dy), so overlapping segments deduplicate with one running
  `a := max(a, prev_b)` scalar; each candidate then enters the compact
  buffer at most once and the usual Chebyshev(cell_j, cell_i) <= 1
  membership mask (identical to the reference's bounds-checked 27-cell
  walk) makes coverage exact. Under-coverage (window clip, slice clamp,
  compact-space overflow, fresh-cell drift past the stale band) is
  counted into a per-group certificate — zero == exactly the reference
  candidate set, as in v6.

Tile geometry: `tune.compact_rows` sorted particles per row-tile
(default 32 — the scalar-core bookkeeping / VPU-density sweet spot),
groups of `tiles_per_group x rows_per_tile` particles share one window
DMA exactly like v6 (same `win_f` bases, same field-major fields array).

Spec: VelPos.compute:49-157 (force + integrate semantics),
Density.compute:32-60 (density), Bucket.compute:18-36 (grid the sorted
structure reproduces).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPSILON
from ..params import PhysParams
from . import pallas_sph as v6
from .pallas_sph import (LANES, N_FIELDS, E_X, PallasTuning, SortedFrame,
                         padded_n, window_rows, _decode_cell, _interpret,
                         _scal)

_PI = math.pi
EX = 1          # x-cell slack on the fresh e=1 line ranges (as v6 fresh)


# --------------------------------------------------------------------------
# geometry
# --------------------------------------------------------------------------

def compact_rows_count(tune: PallasTuning) -> int:
    return tune.compact_rows


def group_particles(tune: PallasTuning) -> int:
    # same group granularity as v6 so win_f bases are shared
    return tune.tiles_per_group * tune.rows_per_tile


def compact_chunks(n: int, r: int, tune: PallasTuning,
                   occ_hint: float | None = None) -> int:
    """Compact-buffer capacity in 128-lane chunks.

    Per line a tile needs ~(rows + (2*EX+1)*occ) lanes (its own span plus
    the +-EX cell margins); nine lines with the w_fudge safety factor.
    Overflow degrades via the certificate, exactly like the v6 line cap.
    """
    if tune.compact_chunks:
        return tune.compact_chunks
    occ = occ_hint if occ_hint is not None else n / float(r * r * r)
    est = 9.0 * (tune.compact_rows + (2 * EX + 1) * occ) + LANES
    return max(2, int(math.ceil(tune.w_fudge * est / LANES)))


def slice_cells(n: int, r: int, tune: PallasTuning,
                occ_hint: float | None = None,
                s_cells: int | None = None) -> int:
    """Static cell count of the per-group start-table SMEM slice.

    Must cover the group's fresh cell span plus the +-(r^2+r+EX+1) line
    query margin; sparse groups whose span exceeds it clamp + certify.
    """
    occ = occ_hint if occ_hint is not None else n / float(r * r * r)
    if s_cells is None:
        s_cells = r * r * r
    gp = group_particles(tune)
    # +1024: the DMA base is aligned DOWN to the 1-D HBM tile (1024 i32),
    # so the slice must absorb up to 1023 cells of alignment slack
    est = (tune.w_fudge * gp / max(occ, 1e-6)
           + 2 * (r * r + r + EX + 2) + 1024)
    cells = int(math.ceil(est / 1024.0)) * 1024
    return min(cells, ((s_cells + 1 + 1023) // 1024) * 1024)


def _pad_cell(s_cells: int, r: int) -> int:
    # pad-tile span sentinel: every line query lands past the table end
    # (start[s_cells] == n), so pad tiles walk zero candidates
    return s_cells + r * r + r + 2


# --------------------------------------------------------------------------
# per-frame / per-substep XLA-side tables (dense vector ops, no gathers)
# --------------------------------------------------------------------------

def stale_spans(frame: SortedFrame, n: int, r: int, tune: PallasTuning,
                s_cells: int | None = None) -> jax.Array:
    """Per-compact-tile stale cid spans i32[T2, 2] (pad tiles -> sentinel).

    Computed from the sorted anchor ids exactly like build_frame's 64-row
    spans, but at compact_rows granularity.
    """
    if s_cells is None:
        s_cells = r * r * r
    crows = tune.compact_rows
    npad = padded_n(n, tune)
    big = jnp.int32(1 << 30)
    cid = jnp.concatenate(
        [frame.cid, jnp.full((npad - frame.cid.shape[0],), s_cells,
                             jnp.int32)])
    ct = cid.reshape(-1, crows)
    live = ct < s_cells
    lo = jnp.min(jnp.where(live, ct, big), axis=1)
    hi = jnp.max(jnp.where(live, ct, -big), axis=1)
    dead = ~live.any(axis=1)
    pad = jnp.int32(_pad_cell(s_cells, r))
    lo = jnp.where(dead, pad, jnp.clip(lo, 0, s_cells - 1))
    hi = jnp.where(dead, pad, jnp.clip(hi, 0, s_cells - 1))
    return jnp.stack([lo, hi], axis=1)


def fresh_spans(frame: SortedFrame, stale: jax.Array, pos_s: jax.Array,
                n: int, r: int, tune: PallasTuning,
                band: tuple[jax.Array, int] | None = None,
                s_cells: int | None = None
                ) -> tuple[jax.Array, jax.Array]:
    """Per-compact-tile FRESH cid spans + drift certificate.

    Fresh cells (VelPos.compute:57-58) clamped to the tile's stale span
    +- one cell-plane (r^2+r+1) — the same drift contract as v6's
    fresh_force_intervals: rows within 1 cell of their stale cell are
    covered exactly; out-of-band rows are counted per row.
    """
    if s_cells is None:
        s_cells = r * r * r
    crows = tune.compact_rows
    npad = padded_n(n, tune)
    cell = jnp.clip((pos_s * (r - 1)).astype(jnp.int32), 0, r - 1)
    if band is None:
        fcid = cell[:, 0] + cell[:, 1] * r + cell[:, 2] * (r * r)
    else:
        zbase, z_span = band
        lzf = jnp.clip(cell[:, 2] - zbase, 0, z_span - 1)
        fcid = cell[:, 0] + cell[:, 1] * r + lzf * (r * r)
    live = frame.cid < s_cells
    fcid = jnp.concatenate(
        [fcid, jnp.broadcast_to(fcid[n - 1:n], (npad - n,))])
    live = (jnp.concatenate([live, jnp.zeros(npad - n, bool)])
            if npad > n else live)
    ft = fcid.reshape(-1, crows)
    lt = live.reshape(-1, crows)
    big = jnp.int32(1 << 30)
    m_allow = r * r + r + 1
    dead = stale[:, 0] >= s_cells
    lo_allow = stale[:, 0] - m_allow
    hi_allow = stale[:, 1] + m_allow
    lo = jnp.min(jnp.where(lt, ft, big), axis=1)
    hi = jnp.max(jnp.where(lt, ft, -big), axis=1)
    out_of_band = ((ft < lo_allow[:, None]) | (ft > hi_allow[:, None]))
    out_of_band = out_of_band & lt & ~dead[:, None]
    drift = jnp.sum(out_of_band.astype(jnp.int32))
    lo = jnp.clip(jnp.clip(lo, lo_allow, hi_allow), 0, s_cells - 1)
    hi = jnp.clip(jnp.clip(hi, lo_allow, hi_allow), 0, s_cells - 1)
    pad = jnp.int32(_pad_cell(s_cells, r))
    lo = jnp.where(dead, pad, lo)
    hi = jnp.where(dead, pad, hi)
    return jnp.stack([lo, hi], axis=1), drift


def _table_len(s_slice: int, s_cells: int) -> int:
    # the start table padded to the 1024-i32 HBM tile, and at least one
    # full slice (DMAs stay in bounds for every aligned base)
    return max(s_slice, ((s_cells + 1 + 1023) // 1024) * 1024)


def group_slice_bases(spans: jax.Array, tune: PallasTuning, r: int,
                      s_slice: int, s_cells: int) -> jax.Array:
    """Per-group start-slice base cells i32[G+1, 1] (last row = prefetch
    pad). The slice must cover every line query of the group's tiles:
    [lo_g - (r^2+r+EX), hi_g + (r^2+r+EX) + 1]."""
    ctpg = group_particles(tune) // tune.compact_rows
    lo_g = jnp.min(spans[:, 0].reshape(-1, ctpg), axis=1)
    # clamp against the PADDED table (a 1024 multiple): the align-down
    # below then can't pull a maximal base off the table end, which would
    # lose the last <=1023 cells of coverage (sparse-grid cert regression)
    base = jnp.clip(lo_g - (r * r + r + EX + 1), 0,
                    _table_len(s_slice, s_cells) - s_slice)
    # Mosaic requires dynamic 1-D HBM slice offsets to be proven multiples
    # of the (1024-element i32) tiling — align down; slice_cells budgeted
    # the slack
    base = (base // 1024) * 1024
    # [G+1, 1, 1]: as with win_f, Mosaic requires the last two block dims
    # to equal the array dims — keep the group axis leading
    return jnp.pad(base[:, None, None].astype(jnp.int32),
                   ((0, 1), (0, 0), (0, 0)))


def padded_start(frame: SortedFrame, s_slice: int, s_cells: int,
                 n: int) -> jax.Array:
    """start table padded so every [base, base+s_slice) DMA is in bounds."""
    tlen = _table_len(s_slice, s_cells)
    if s_cells + 1 >= tlen:
        return frame.start
    return jnp.pad(frame.start, (0, tlen - (s_cells + 1)),
                   constant_values=n)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _compact_kernel(force: bool, fused: bool, use_ext: bool, r: int,
                    w_rows: int, s_slice: int, ck: int, crows: int,
                    ctpg: int, s_cells: int, n_wf: int,
                    win_ref, win_nxt_ref, sb_ref, spans_ref,
                    rows_ref, scal_ref, fields_ref, start_ref,
                    out_ref, cert_ref, scratch, sems, slc, slc_sem):
    """One group: window DMA (as v6) + start-slice DMA, then per row-tile:
    scalar line bounds -> funnel-compact the nine segments into dense
    chunks -> pair math on the dense lanes -> (fused) integrate tail."""
    rf = jnp.float32(r)
    g = pl.program_id(0)
    slot = jax.lax.rem(g, 2)
    bf16 = n_wf == 6    # force window with bf16 pair-packed vel/rho

    def _win_copies(slot_idx, wref):
        return [pltpu.make_async_copy(
            fields_ref.at[f, pl.ds(wref[0, 0, 0], w_rows)],
            scratch.at[slot_idx, :, f],
            sems.at[slot_idx, f]) for f in range(n_wf)]

    # The start-table slice is single-buffered and copied synchronously at
    # group start: a DMA whose destination is a sub-view of a 2-D SMEM
    # scratch (slc.at[slot] on a (2, s_slice) buffer) crashes the Mosaic
    # compiler on this libtpu (bisected 2026-08-17: subview_scalar_sem
    # FAILs, single_buffer_sync OK). The copy is ~16 KB once per group and
    # overlaps the window-DMA wait below, so the lost prefetch is noise.
    def _slice_copy(sref):
        off = pl.multiple_of(sref[0, 0, 0], 1024)
        return pltpu.make_async_copy(
            start_ref.at[pl.ds(off, s_slice)], slc, slc_sem)

    @pl.when(g == 0)
    def _():
        for c in _win_copies(0, win_ref):
            c.start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        for c in _win_copies(1 - slot, win_nxt_ref):
            c.start()

    sc = _slice_copy(sb_ref)
    sc.start()
    for c in _win_copies(slot, win_ref):
        c.wait()
    sc.wait()

    h = scal_ref[0, 0]
    gas_k = scal_ref[0, 1]
    rho0 = scal_ref[0, 2]
    h2 = h * h
    h6 = h2 * h2 * h2
    h9 = h6 * h2 * h
    c_poly6 = jnp.float32(315.0 / (64.0 * _PI))
    c_grad = jnp.float32(45.0 / _PI)
    cs = jnp.sqrt(gas_k)
    cbase = sb_ref[0, 0, 0]
    wlane0 = win_ref[0, 0, 0] * LANES
    wl_max = w_rows * LANES
    # strictly increasing (dz, dy) line offsets -> monotone bounds -> the
    # one-scalar running dedup below is exact (r > 4 so r*r > 2*r)
    offs = [dz * r * r + dy * r for dz in (-1, 0, 1) for dy in (-1, 0, 1)]

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (n_wf, LANES), 1)
    zero_chunk = jnp.zeros((n_wf, LANES), jnp.float32)

    def tile_body(rt, cert):
        rows = rows_ref[rt]                               # (crows, 8)
        rx = rows[:, 0:1]
        ry = rows[:, 1:2]
        rz = rows[:, 2:3]

        def _trunc(v):
            # HLSL int3() truncation-toward-zero (VelPos.compute:58)
            return v.astype(jnp.int32).astype(jnp.float32)

        fx = _trunc(rx * (rf - 1.0))
        fy = _trunc(ry * (rf - 1.0))
        fz = _trunc(rz * (rf - 1.0))

        lo = spans_ref[rt, 0]
        hi = spans_ref[rt, 1]
        tile_dead = lo >= s_cells

        # ---- compaction: nine line segments -> dense chunks ----
        cbuf = [zero_chunk] * ck
        c_len = jnp.int32(0)
        prev_b = jnp.int32(0)
        tcert = jnp.int32(0)
        for off in offs:
            qa = lo + off - EX
            qb = hi + off + EX + 1
            qat = jnp.clip(qa, 0, s_cells)      # table-exact cell clamp
            qbt = jnp.clip(qb, 0, s_cells)
            qas = jnp.clip(qat - cbase, 0, s_slice - 1)
            qbs = jnp.clip(qbt - cbase, 0, s_slice - 1)
            # slice-window under-coverage (sparse group span > slice)
            out_slice = ((qas + cbase != qat) | (qbs + cbase != qbt))
            a = slc[qas]
            b = slc[qbs]
            a = jnp.maximum(a, prev_b)          # dedup overlapping lines
            b = jnp.maximum(b, a)
            prev_b = b
            a_rel = a - wlane0
            b_rel = b - wlane0
            clip_w = (a_rel < 0) | (b_rel > wl_max)
            a_rel = jnp.clip(a_rel, 0, wl_max)
            b_rel = jnp.clip(b_rel, jnp.int32(0), wl_max)
            b_rel = jnp.maximum(b_rel, a_rel)
            ln = b_rel - a_rel
            ovf = ln > ck * LANES - c_len
            ln = jnp.minimum(ln, ck * LANES - c_len)
            bad = jnp.where(
                tile_dead, False,
                out_slice | ((clip_w | ovf) & (b > a)))
            tcert = tcert + bad.astype(jnp.int32)

            for d in range(ck):
                live_d = ((ln > 0) & (c_len < (d + 1) * LANES)
                          & (c_len + ln > d * LANES))

                def _merge(cb, a_rel=a_rel, c_len=c_len, ln=ln, d=d):
                    # dest lane i of chunk d <- window lane
                    # a_rel + (d*128 + i) - c_len
                    k = a_rel - c_len + d * LANES
                    q0 = jax.lax.div(k, jnp.int32(LANES))
                    m = k - q0 * LANES          # k mod 128 (k can be <0;
                    m = jnp.where(m < 0, m + LANES, m)
                    q0 = jnp.where(k - q0 * LANES < 0, q0 - 1, q0)
                    # lax.div truncates toward zero; fix to floor)
                    q0c = jnp.clip(q0, 0, w_rows - 1)
                    q1c = jnp.clip(q0 + 1, 0, w_rows - 1)
                    sh = jnp.where(m == 0, 0, LANES - m)
                    ra = pltpu.roll(scratch[slot, q0c], shift=sh, axis=1)
                    rb = pltpu.roll(scratch[slot, q1c], shift=sh, axis=1)
                    v = jnp.where(lane_i < LANES - m, ra, rb)
                    msk = ((lane_i >= c_len - d * LANES)
                           & (lane_i < c_len + ln - d * LANES))
                    return jnp.where(msk, v, cb)

                cbuf[d] = jax.lax.cond(live_d, _merge, lambda cb: cb,
                                       cbuf[d])
            c_len = c_len + ln

        # ---- pair math over the dense chunks ----
        if force:
            rvx = rows[:, 3:4]
            rvy = rows[:, 4:5]
            rvz = rows[:, 5:6]
            rrho = rows[:, 6:7]
            press_i = gas_k * (rrho - rho0)
            n_acc = 12 if use_ext else 6
        else:
            n_acc = 1
        acc = [jnp.zeros((crows, LANES), jnp.float32) for _ in range(n_acc)]

        def pair_block(blk, lane_gate, acc):
            cxl, cyl, czl = _decode_cell(blk[3:4, :], r)
            occ = blk[3:4, :] >= 0.0
            member = (occ
                      & (jnp.abs(cxl - fx) <= 1.0)
                      & (jnp.abs(cyl - fy) <= 1.0)
                      & (jnp.abs(czl - fz) <= 1.0))
            # select-gating, not multiplicative: 0*inf = NaN would inject
            # NaN traps from non-candidate lanes (see pallas_sph pair_block)
            gate = member & lane_gate

            dxv = rx - blk[0:1, :]
            dyv = ry - blk[1:2, :]
            dzv = rz - blk[2:3, :]
            r2 = dxv * dxv + dyv * dyv + dzv * dzv

            if not force:
                diff = h2 - r2
                w = jnp.where(diff > 0, c_poly6 * diff * diff * diff / h9,
                              0.0)
                acc[0] = acc[0] + jnp.where(gate, w, 0.0)
                return acc

            if bf16:
                vjx, vjy = v6.unpack_pair_bf16(blk[4:5, :])
                vjz, rho_j = v6.unpack_pair_bf16(blk[5:6, :])
            else:
                vjx, vjy, vjz = blk[4:5, :], blk[5:6, :], blk[6:7, :]
                rho_j = blk[7:8, :]
            rho_ok = rho_j > EPSILON                 # VelPos.compute:91
            inv_rho = jnp.where(rho_ok, 1.0, 0.0) / jnp.where(
                rho_ok, rho_j, 1.0)
            abs_r = jnp.sqrt(r2)
            rs = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
            diff_r = h - abs_r
            valid = (diff_r > EPSILON) & (abs_r > EPSILON)
            gwp = jnp.where(
                valid, (c_grad / h6) * diff_r * diff_r * diff_r * rs, 0.0)
            gwv = jnp.where(abs_r < h, (c_grad / h6) * diff_r, 0.0)
            press_j = gas_k * (rho_j - rho0)
            # whole-term selects: candidate positions can faithfully be
            # NaN (see pallas_sph pair_block), so 0 * dxv can be NaN
            pc = (press_i + press_j) * 0.5 * inv_rho * gwp
            acc[0] = acc[0] + jnp.where(gate, pc * dxv, 0.0)
            acc[1] = acc[1] + jnp.where(gate, pc * dyv, 0.0)
            acc[2] = acc[2] + jnp.where(gate, pc * dzv, 0.0)
            vc = gwv * inv_rho
            acc[3] = acc[3] + jnp.where(gate, vc * (vjx - rvx), 0.0)
            acc[4] = acc[4] + jnp.where(gate, vc * (vjy - rvy), 0.0)
            acc[5] = acc[5] + jnp.where(gate, vc * (vjz - rvz), 0.0)
            if use_ext:
                d2 = h2 - r2
                w6 = jnp.where(d2 > 0, c_poly6 * d2 * d2 * d2 / h9, 0.0)
                denom = rrho + rho_j
                xc = jnp.where(denom > EPSILON, 2.0, 0.0) \
                    / jnp.where(denom > EPSILON, denom, 1.0) * w6
                acc[6] = acc[6] + jnp.where(gate, xc * (vjx - rvx), 0.0)
                acc[7] = acc[7] + jnp.where(gate, xc * (vjy - rvy), 0.0)
                acc[8] = acc[8] + jnp.where(gate, xc * (vjz - rvz), 0.0)
                dvx2 = rvx - vjx
                dvy2 = rvy - vjy
                dvz2 = rvz - vjz
                vr = dvx2 * dxv + dvy2 * dyv + dvz2 * dzv
                rho_bar = 0.5 * (rrho + rho_j)
                mu = h * vr / (r2 + 0.01 * h2)
                pi_ok = (vr < 0) & (rho_bar > EPSILON)
                pi = jnp.where(pi_ok, -cs * mu, 0.0) \
                    / jnp.where(pi_ok, rho_bar, 1.0)
                ac = pi * gwp
                acc[9] = acc[9] + jnp.where(gate, ac * dxv, 0.0)
                acc[10] = acc[10] + jnp.where(gate, ac * dyv, 0.0)
                acc[11] = acc[11] + jnp.where(gate, ac * dzv, 0.0)
            return acc

        for d in range(ck):
            def _eval(acc, d=d):
                lg = (jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                      < c_len - d * LANES)
                return pair_block(cbuf[d], lg, acc)

            acc = jax.lax.cond(c_len > d * LANES, _eval,
                               lambda acc: acc, acc)

        sums = [jnp.sum(a, axis=1, keepdims=True) for a in acc]
        if not fused:
            outv = jnp.concatenate(
                sums + [jnp.zeros((crows, N_FIELDS - len(sums)),
                                  jnp.float32)], axis=1)
            out_ref[rt] = outv
            return cert + tcert

        # ---- fused integrate tail: VelPos.compute:101-157, same op
        # order as the v6 fused tail ----
        mass = scal_ref[0, 3]
        visc = scal_ref[0, 4]
        stiff = scal_ref[0, 5]
        damping = scal_ref[0, 6]
        grav_y = scal_ref[0, 7]
        dt = scal_ref[0, 8]
        xsph_eps = scal_ref[0, 9]
        alpha_visc = scal_ref[0, 10]

        i_ok = rrho > EPSILON
        safe = jnp.where(i_ok, rrho, 1.0)
        sp = mass * mass / safe
        fpx = jnp.where(i_ok, sums[0] * sp, sums[0])
        fpy = jnp.where(i_ok, sums[1] * sp, sums[1])
        fpz = jnp.where(i_ok, sums[2] * sp, sums[2])
        sv = visc * mass * mass / safe
        fvx = jnp.where(i_ok, sums[3] * sv, sums[3])
        fvy = jnp.where(i_ok, sums[4] * sv, sums[4])
        fvz = jnp.where(i_ok, sums[5] * sv, sums[5])
        ffx = fpx + fvx
        ffy = fpy + fvy
        ffz = fpz + fvz
        if use_ext:
            xs = xsph_eps * mass
            dvx = xs * sums[6]
            dvy = xs * sums[7]
            dvz = xs * sums[8]
            av = alpha_visc * mass * mass
            ffx = ffx + av * sums[9]
            ffy = ffy + av * sums[10]
            ffz = ffz + av * sums[11]
        else:
            dvx = dvy = dvz = jnp.float32(0.0)

        def wall_r(p):
            return jnp.where(p < h, h - p,
                             jnp.where(p > 1.0 - h, 1.0 - p - h, 0.0))

        rwx = wall_r(rx)
        rwy = wall_r(ry)
        rwz = wall_r(rz)
        damp_dot = (jnp.where(rwx != 0.0, damping, 0.0) * rvx
                    + jnp.where(rwy != 0.0, damping, 0.0) * rvy
                    + jnp.where(rwz != 0.0, damping, 0.0) * rvz)
        active = jnp.maximum(jnp.abs(rwx),
                             jnp.maximum(jnp.abs(rwy),
                                         jnp.abs(rwz))) > 0.0
        fwx = jnp.where(active, (rwx * stiff - damp_dot) * mass, 0.0)
        fwy = jnp.where(active, (rwy * stiff - damp_dot) * mass, 0.0)
        fwz = jnp.where(active, (rwz * stiff - damp_dot) * mass, 0.0)

        ax = (ffx + fwx) / mass
        ay = grav_y + (ffy + fwy) / mass
        az = (ffz + fwz) / mass
        nan_mask = jnp.isnan(ax) | jnp.isnan(ay) | jnp.isnan(az)
        nvx = jnp.where(nan_mask, 0.0, rvx + ax * dt)
        nvy = jnp.where(nan_mask, 0.0, rvy + ay * dt)
        nvz = jnp.where(nan_mask, 0.0, rvz + az * dt)
        npx = jnp.clip(rx + dt * (nvx + dvx), 0.0, 1.0)
        npy = jnp.clip(ry + dt * (nvy + dvy), 0.0, 1.0)
        npz = jnp.clip(rz + dt * (nvz + dvz), 0.0, 1.0)
        aux = rows[:, 7:8] + nan_mask.astype(jnp.float32)

        out_ref[rt] = jnp.concatenate(
            [npx, npy, npz, nvx, nvy, nvz, rrho, aux], axis=1)
        return cert + tcert

    # Mosaic fori_loop supports only unroll=1 or full unroll; the per-tile
    # work is heavy enough that loop bookkeeping is noise here
    cert = jax.lax.fori_loop(0, ctpg, tile_body, jnp.int32(0),
                             unroll=False)
    cert_ref[0, 0, 0] = cert


def _call_compact(force: bool, fused: bool, use_ext: bool, r: int, n: int,
                  tune: PallasTuning, occ_hint: float | None,
                  win, sbases, spans, rows_c, scal, fields, startp,
                  s_cells: int):
    crows = tune.compact_rows
    gp = group_particles(tune)
    ctpg = gp // crows
    npad = padded_n(n, tune)
    n_groups = npad // gp
    w_rows = window_rows(n, r, 2, E_X, tune, occ_hint)
    ck = compact_chunks(n, r, tune, occ_hint)
    s_slice = slice_cells(n, r, tune, occ_hint, s_cells)
    n_wf = v6.n_window_fields(force, tune)

    kernel = functools.partial(_compact_kernel, force, fused, use_ext, r,
                               w_rows, s_slice, ck, crows, ctpg, s_cells,
                               n_wf)
    out, cert = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (g + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ctpg, 2), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ctpg, crows, N_FIELDS),
                         lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((ctpg, crows, N_FIELDS), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups * ctpg, crows, N_FIELDS),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, w_rows, n_wf, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_wf)),
            pltpu.SMEM((s_slice,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(win, win, sbases, spans, rows_c, scal, fields, startp)
    return out, jnp.sum(cert)


# --------------------------------------------------------------------------
# public entry points (mirror the v6 API)
# --------------------------------------------------------------------------

def density_compact(frame: SortedFrame, pos_s: jax.Array, phys: PhysParams,
                    r: int, n: int, tune: PallasTuning | None = None,
                    occ_hint: float | None = None,
                    band: tuple[jax.Array, int] | None = None
                    ) -> tuple[jax.Array, jax.Array]:
    """rho per sorted particle (Density.compute:32-60) + certificate."""
    tune = tune or v6.default_tuning()
    s_cells = (r * r * r if band is None else band[1] * r * r)
    zeros3 = jnp.zeros_like(pos_s)
    zeros1 = jnp.zeros(pos_s.shape[0], jnp.float32)
    fields = v6.pack_fields(frame, pos_s, zeros3, zeros1, n, r, tune,
                            occ_hint, force=False)
    rows = v6.pack_rows(pos_s, zeros3, zeros1, None, n, tune)
    rows_c = rows.reshape(-1, tune.compact_rows, N_FIELDS)
    spans = stale_spans(frame, n, r, tune, s_cells)
    s_slice = slice_cells(n, r, tune, occ_hint, s_cells)
    sbases = group_slice_bases(spans, tune, r, s_slice, s_cells)
    startp = padded_start(frame, s_slice, s_cells, n)
    out, cert = _call_compact(
        False, False, False, r, n, tune, occ_hint,
        frame.win_f, sbases, spans, rows_c, _scal(phys), fields, startp,
        s_cells)
    w_sum = out[:, :, 0].reshape(-1)[:n]
    return phys.mass * w_sum, cert


def compact_substep(frame: SortedFrame, rows: jax.Array, phys: PhysParams,
                    r: int, n: int, *, xsph: float = 0.0,
                    alpha_visc: float = 0.0,
                    tune: PallasTuning | None = None,
                    band: tuple[jax.Array, int] | None = None,
                    occ_hint: float | None = None
                    ) -> tuple[jax.Array, jax.Array]:
    """One whole integration substep, v7 compact kernel, rows-layout state.

    Drop-in for v6 fused_substep (same (new_rows, cert) contract; float
    sums differ only in accumulation order)."""
    tune = tune or v6.default_tuning()
    use_ext = xsph != 0.0 or alpha_visc != 0.0
    s_cells = (r * r * r if band is None else band[1] * r * r)
    pos_s = rows.reshape(-1, N_FIELDS)[:n, 0:3]
    fields = v6.fields_from_rows(frame, rows, n, r, tune, occ_hint)
    stale = stale_spans(frame, n, r, tune, s_cells)
    spans, drift = fresh_spans(frame, stale, pos_s, n, r, tune, band,
                               s_cells)
    s_slice = slice_cells(n, r, tune, occ_hint, s_cells)
    sbases = group_slice_bases(spans, tune, r, s_slice, s_cells)
    startp = padded_start(frame, s_slice, s_cells, n)
    rows_c = rows.reshape(-1, tune.compact_rows, N_FIELDS)
    out, cert = _call_compact(
        True, True, use_ext, r, n, tune, occ_hint,
        frame.win_f, sbases, spans, rows_c,
        _scal(phys, xsph, alpha_visc), fields, startp, s_cells)
    npad = padded_n(n, tune)
    new_rows = out.reshape(npad // tune.rows_per_tile,
                           tune.rows_per_tile, N_FIELDS)
    return new_rows, cert + drift


def forces_compact(frame: SortedFrame, pos_s: jax.Array, vel_s: jax.Array,
                   rho_s: jax.Array, phys: PhysParams, r: int, n: int, *,
                   xsph: float = 0.0, alpha_visc: float = 0.0,
                   tune: PallasTuning | None = None
                   ) -> tuple[jax.Array, jax.Array | None, jax.Array]:
    """Unfused force sums (v6 forces_pallas contract) on the v7 kernel."""
    tune = tune or v6.default_tuning()
    use_ext = xsph != 0.0 or alpha_visc != 0.0
    s_cells = r * r * r
    fields = v6.pack_fields(frame, pos_s, vel_s, rho_s, n, r, tune)
    rows = v6.pack_rows(pos_s, vel_s, rho_s, None, n, tune)
    rows_c = rows.reshape(-1, tune.compact_rows, N_FIELDS)
    stale = stale_spans(frame, n, r, tune, s_cells)
    spans, drift = fresh_spans(frame, stale, pos_s, n, r, tune, None,
                               s_cells)
    s_slice = slice_cells(n, r, tune, None, s_cells)
    sbases = group_slice_bases(spans, tune, r, s_slice, s_cells)
    startp = padded_start(frame, s_slice, s_cells, n)
    out, cert = _call_compact(
        True, False, use_ext, r, n, tune, None,
        frame.win_f, sbases, spans, rows_c,
        _scal(phys, xsph, alpha_visc), fields, startp, s_cells)
    flat = out.reshape(-1, N_FIELDS)[:n]
    f_press = flat[:, 0:3]
    f_vis = flat[:, 3:6]
    i_ok = (rho_s > EPSILON)[:, None]
    safe = jnp.where(rho_s > EPSILON, rho_s, 1.0)[:, None]
    f_press = jnp.where(i_ok, f_press * (phys.mass * phys.mass / safe),
                        f_press)
    f_vis = jnp.where(
        i_ok, f_vis * (phys.viscosity * phys.mass * phys.mass / safe),
        f_vis)
    # ext sums don't fit the 8-lane unfused out layout; unfused+ext runs
    # route through v6 (stepper only uses unfused for the corrected mode)
    return f_press + f_vis, None, cert + drift
