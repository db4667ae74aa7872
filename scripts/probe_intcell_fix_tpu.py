"""Follow-up to probe_intops_tpu.py: stage 3 (rowkey build via i32 shifts
on (64,1) vectors) MISCOMPILES on this chip while stages 1/2/4 are exact.
Isolate the failing sub-op and measure fix candidates:

  a. f32->i32 convert at (64,1), no shifts        (is the convert clean?)
  b. i32 left-shift alone at (64,1)               (is the shift the bug?)
  c. i32 multiply-by-constant at (64,1)           (fix candidate 1)
  d. broadcast to (64,128) FIRST, then shifts     (fix candidate 2)
  e. full rowkey via multiplies at (64,1)         (the kernel-shaped fix)

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

    rc = rng.randint(-2, 259, (64, 3)).astype(np.float32)
    icol = rc.astype(np.int32)

    # ---- a: convert alone at (64,1) ----
    def ka(x_ref, o_ref):
        ix = x_ref[:, 0:1].astype(jnp.int32)
        o_ref[...] = jnp.broadcast_to(ix.astype(jnp.float32), (64, 128))

    ta = np.broadcast_to(icol[:, 0:1].astype(np.float32), (64, 128)).copy()
    run("a_convert_64x1", ka, [rc], (64, 128), ta)

    # ---- b: shift alone at (64,1) ----
    def kb(x_ref, o_ref):
        iy = x_ref[:, 1:2].astype(jnp.int32)
        o_ref[...] = jnp.broadcast_to(
            (iy << 10).astype(jnp.float32), (64, 128))

    tb = np.broadcast_to(
        (icol[:, 1:2] << 10).astype(np.float32), (64, 128)).copy()
    run("b_shift_64x1", kb, [rc], (64, 128), tb)

    # ---- c: multiply-by-1024 alone at (64,1) ----
    def kc(x_ref, o_ref):
        iy = x_ref[:, 1:2].astype(jnp.int32)
        o_ref[...] = jnp.broadcast_to(
            (iy * jnp.int32(1024)).astype(jnp.float32), (64, 128))

    run("c_mul_64x1", kc, [rc], (64, 128), tb)

    # ---- d: broadcast to (64,128) first, then shifts ----
    def kd(x_ref, o_ref):
        ix = jnp.broadcast_to(x_ref[:, 0:1], (64, 128)).astype(jnp.int32)
        iy = jnp.broadcast_to(x_ref[:, 1:2], (64, 128)).astype(jnp.int32)
        iz = jnp.broadcast_to(x_ref[:, 2:3], (64, 128)).astype(jnp.int32)
        key = ix + (iy << 10) + (iz << 20)
        o_ref[...] = key.astype(jnp.float32)

    tkey = (icol[:, 0:1].astype(np.int64)
            + (icol[:, 1:2].astype(np.int64) << 10)
            + (icol[:, 2:3].astype(np.int64) << 20)).astype(np.int32)
    td = np.broadcast_to(tkey.astype(np.float32), (64, 128)).copy()
    run("d_bcast_then_shift", kd, [rc], (64, 128), td)

    # ---- e: full rowkey via multiplies at (64,1) (kernel-shaped fix) ----
    def ke(x_ref, o_ref):
        ix = x_ref[:, 0:1].astype(jnp.int32)
        iy = x_ref[:, 1:2].astype(jnp.int32)
        iz = x_ref[:, 2:3].astype(jnp.int32)
        key = ix + iy * jnp.int32(1 << 10) + iz * jnp.int32(1 << 20)
        o_ref[...] = jnp.broadcast_to(key.astype(jnp.float32), (64, 128))

    run("e_rowkey_mul_64x1", ke, [rc], (64, 128), td)

    # ---- f: the membership expression with a mul-built row key,
    #         end-to-end vs numpy (the exact shipped-kernel shape) ----
    BIAS = 1 + (1 << 10) + (1 << 20)
    r = 19
    cell = rng.randint(0, r, (128, 3)).astype(np.int32)
    enc = (cell[:, 0] + (cell[:, 1] << 10) + (cell[:, 2] << 20))
    enc[rng.rand(128) < 0.2] = -1
    enc_f = enc.astype(np.int32).view(np.float32)[None, :]
    rcell = rng.randint(-2, r + 2, (64, 3)).astype(np.float32)

    def kf(e_ref, c_ref, o_ref):
        import jax.lax as lax
        ix = c_ref[:, 0:1].astype(jnp.int32)
        iy = c_ref[:, 1:2].astype(jnp.int32)
        iz = c_ref[:, 2:3].astype(jnp.int32)
        rk = jnp.int32(BIAS) - (ix + iy * jnp.int32(1 << 10)
                                + iz * jnp.int32(1 << 20))
        vj = lax.bitcast_convert_type(e_ref[...], jnp.int32)
        t = vj + rk
        member = ((vj >= 0)
                  & ((t & 1023) <= 2)
                  & (((t >> 10) & 1023) <= 2)
                  & (((t >> 20) & 1023) <= 2))
        o_ref[...] = member.astype(jnp.float32)

    ri = rcell.astype(np.int32)
    rkey = (BIAS - (ri[:, 0:1] + (ri[:, 1:2] << 10)
                    + (ri[:, 2:3] << 20))).astype(np.int32)
    tv = (enc[None, :].astype(np.int64)
          + rkey.astype(np.int64)).astype(np.int32)
    tf = ((enc[None, :] >= 0)
          & ((tv & 1023) <= 2)
          & (((tv >> 10) & 1023) <= 2)
          & (((tv >> 20) & 1023) <= 2)).astype(np.float32)
    run("f_membership_mulkey", kf, [enc_f, rcell], (64, 128), tf)

    os._exit(0)


if __name__ == "__main__":
    main()
