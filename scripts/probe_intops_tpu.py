"""Unit-probe the in-kernel int ops behind PallasTuning.intcell on the
real TPU (Mosaic), against numpy truth.

The TPU smoke bisect showed intcell produces wrong memberships COMPILED
while interpret mode is bit-exact — so one of these primitives
miscompiles on this chip/toolchain: f32<->i32 bitcast on lanes,
arithmetic right-shift / and / compare on i32 vectors, f32->i32
truncating convert, i32 shifts on (R,1)-shaped vectors, or the
(R,1)+(1,128) broadcast add. Each stage isolates one; the last stage
runs the exact membership expression from _sph_kernel.

Exits via os._exit(0) (worker-crash discipline).
"""
import os
import signal
import sys

sys.path.insert(0, "/root/repo")


def main():
    def on_alarm(*a):
        print("ALARM", flush=True)
        os._exit(9)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(1200)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl

    from sphfluidsimulation_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    float(jnp.sum(jnp.ones(8)))
    print("TPU up", flush=True)

    rng = np.random.RandomState(0)

    def run(name, kernel, inputs, out_shape, truth):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32))
        got = np.asarray(f(*[jnp.asarray(x) for x in inputs]))
        ok = np.array_equal(got, truth)
        bad = int((got != truth).sum())
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({bad} bad)",
              flush=True)
        if not ok:
            idx = np.argwhere(got != truth)[0]
            print(f"  first bad at {tuple(idx)}: got {got[tuple(idx)]} "
                  f"want {truth[tuple(idx)]}", flush=True)
        return ok

    # ---- stage 1: bitcast -> shift -> mask on (8, 128) lanes ----
    enc_i = rng.randint(-(1 << 28), 1 << 28, (8, 128)).astype(np.int32)
    enc_f = enc_i.view(np.float32)

    def k1(x_ref, o_ref):
        v = lax.bitcast_convert_type(x_ref[...], jnp.int32)
        o_ref[...] = ((v >> 10) & 1023).astype(jnp.float32)

    t1 = ((enc_i >> 10) & 1023).astype(np.float32)
    run("bitcast_shift_mask_8x128", k1, [enc_f], (8, 128), t1)

    # ---- stage 2: f32 -> i32 truncating convert (negatives too) ----
    xs = (rng.uniform(-3, 3, (8, 128)) * 10).astype(np.float32)

    def k2(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.int32).astype(jnp.float32)

    t2 = xs.astype(np.int32).astype(np.float32)
    run("trunc_convert_8x128", k2, [xs], (8, 128), t2)

    # ---- stage 3: (64,1) i32 shifts/adds (the row-key build) ----
    rc = rng.randint(-2, 259, (64, 3)).astype(np.float32)

    def k3(x_ref, o_ref):
        ix = x_ref[:, 0:1].astype(jnp.int32)
        iy = x_ref[:, 1:2].astype(jnp.int32)
        iz = x_ref[:, 2:3].astype(jnp.int32)
        key = ix + (iy << 10) + (iz << 20)
        o_ref[...] = jnp.broadcast_to(key.astype(jnp.float32), (64, 128))

    t3 = np.broadcast_to(
        (rc[:, 0:1].astype(np.int32) + (rc[:, 1:2].astype(np.int32) << 10)
         + (rc[:, 2:3].astype(np.int32) << 20)).astype(np.float32),
        (64, 128)).copy()
    run("rowkey_shifts_64x1", k3, [rc], (64, 128), t3)

    # ---- stage 4: full membership expression, (64,1)+(1,128) bcast ----
    BIAS = 1 + (1 << 10) + (1 << 20)
    r = 19
    cell = rng.randint(0, r, (128, 3)).astype(np.int32)
    enc = (cell[:, 0] + (cell[:, 1] << 10) + (cell[:, 2] << 20))
    enc[rng.rand(128) < 0.2] = -1          # dropped-slot sentinel
    enc_f = enc.astype(np.int32).view(np.float32)[None, :]  # (1,128)
    rcell = rng.randint(-2, r + 2, (64, 3)).astype(np.int32)
    rkey = (BIAS - (rcell[:, 0] + (rcell[:, 1] << 10)
                    + (rcell[:, 2] << 20))).astype(np.int32)
    rkey_f = rkey.view(np.float32)[:, None]   # (64,1)

    def k4(e_ref, k_ref, o_ref):
        vj = lax.bitcast_convert_type(e_ref[...], jnp.int32)
        rk = lax.bitcast_convert_type(k_ref[...], jnp.int32)
        t = vj + rk
        member = ((vj >= 0)
                  & ((t & 1023) <= 2)
                  & (((t >> 10) & 1023) <= 2)
                  & (((t >> 20) & 1023) <= 2))
        o_ref[...] = member.astype(jnp.float32)

    tv = enc[None, :].astype(np.int64) + rkey[:, None].astype(np.int64)
    tv = tv.astype(np.int32)
    t4 = ((enc[None, :] >= 0)
          & ((tv & 1023) <= 2)
          & (((tv >> 10) & 1023) <= 2)
          & (((tv >> 20) & 1023) <= 2)).astype(np.float32)
    run("membership_bcast_64x128", k4, [enc_f, rkey_f], (64, 128), t4)

    # truth cross-check: membership == per-axis |d|<=1 on this data
    dx = cell[None, :, 0] - rcell[:, None, 0]
    dy = cell[None, :, 1] - rcell[:, None, 1]
    dz = cell[None, :, 2] - rcell[:, None, 2]
    ref = ((enc[None, :] >= 0) & (np.abs(dx) <= 1) & (np.abs(dy) <= 1)
           & (np.abs(dz) <= 1)).astype(np.float32)
    print("digit-test == per-axis truth:", bool((t4 == ref).all()),
          flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
