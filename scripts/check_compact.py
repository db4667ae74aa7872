#!/usr/bin/env python
"""Quick v7-compact vs v6 equivalence drive (CPU interpret mode)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from sphfluidsimulation_tpu.config import SimConfig
from sphfluidsimulation_tpu.params import PhysParams
from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
from sphfluidsimulation_tpu.sim.stepper import (initial_state,
                                                make_param_step)


def main():
    cfg = SimConfig(particle_number=1024, bucket_resolution=11, preset=0,
                    gas_constant=20.0)
    st = initial_state(cfg)
    phys = PhysParams.from_config(cfg)
    t6 = PallasTuning(fused=True, compact=False)
    t7 = t6._replace(compact=True)

    s6, m6 = jax.jit(make_param_step(cfg, neighbor="pallas",
                                     pallas_tune=t6))(st, phys)
    print("v6 cert", int(m6.exact_cert), "mean_rho",
          float(m6.mean_density))
    s7, m7 = jax.jit(make_param_step(cfg, neighbor="pallas",
                                     pallas_tune=t7))(st, phys)
    print("v7 cert", int(m7.exact_cert), "mean_rho",
          float(m7.mean_density))

    dp = np.abs(np.asarray(s7.pos) - np.asarray(s6.pos)).max()
    dv = np.abs(np.asarray(s7.vel) - np.asarray(s6.vel)).max()
    print(f"max|dpos|={dp:.3e} max|dvel|={dv:.3e}")
    assert int(m7.exact_cert) == 0, int(m7.exact_cert)
    assert dp < 1e-6 and dv < 1e-4, (dp, dv)
    print("OK")
    return 0


if __name__ == "__main__":
    rc = main()
    if "tpu" in sys.argv:
        sys.stdout.flush()
        os._exit(rc)
    sys.exit(rc)
