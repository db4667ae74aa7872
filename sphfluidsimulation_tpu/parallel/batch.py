"""Batched multi-scene simulation (data parallelism over scenes).

BASELINE config 5: a vmapped sweep of scenes with varied physics parameters
(rest density / stiffness / viscosity ...). The reference can only run one
scene per process (a Unity MonoBehaviour — SphFluidSimulation.cs); here a
batch of scenes is one jitted program, vmapped over both the particle state
and the :class:`PhysParams` pytree, and sharded over a device mesh axis so
each chip advances a subset of scenes with zero cross-chip traffic.

All scenes in a batch share structure (particle count, bucket resolution,
capacity — these fix array shapes); physics scalars vary per scene.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..params import PhysParams, stack_params
from ..sim.stepper import initial_state, make_param_step
from ..state import ParticleState, StepMetrics


def batch_configs(base: SimConfig, overrides: Sequence[dict]) -> list[SimConfig]:
    """One config per scene; all must share structural fields."""
    cfgs = [base.replace(**ov) for ov in overrides]
    for c in cfgs:
        if (c.n_particles, c.bucket_resolution, c.voxel_capacity, c.substeps) \
                != (base.n_particles, base.bucket_resolution,
                    base.voxel_capacity, base.substeps):
            raise ValueError(
                "batched scenes must share structural config (particle "
                "count, bucket resolution, capacity, substeps); vary only "
                "physics scalars / presets / seeds")
    return cfgs


def make_batched_step(base: SimConfig, *, neighbor: str = "slotted",
                      faithful: bool = True):
    """vmapped ``(states, params) → (states, metrics)`` over a scene axis."""
    step = make_param_step(base, neighbor=neighbor, faithful=faithful)
    return jax.vmap(step, in_axes=(0, 0))


class BatchedScenes:
    """A sweep of scenes advanced in lockstep.

    With a mesh, scenes are sharded over the named axis (pure data
    parallelism: the only collectives are for aggregate metrics the caller
    may reduce). Without a mesh, runs single-device.
    """

    def __init__(self, base: SimConfig, overrides: Sequence[dict], *,
                 neighbor: str = "slotted", faithful: bool = True,
                 mesh: Mesh | None = None, axis: str = "scene"):
        self.configs = batch_configs(base, overrides)
        self.params = stack_params([PhysParams.from_config(c)
                                    for c in self.configs])
        states = [initial_state(c) for c in self.configs]
        self.states: ParticleState = jax.tree.map(
            lambda *xs: jnp.stack(xs), *states)
        step = make_batched_step(base, neighbor=neighbor, faithful=faithful)

        if mesh is not None:
            state_sharding = jax.tree.map(
                lambda x: NamedSharding(mesh, P(axis)), self.states)
            param_sharding = jax.tree.map(
                lambda x: NamedSharding(mesh, P(axis)), self.params)
            self.states = jax.device_put(self.states, state_sharding)
            self.params = jax.device_put(self.params, param_sharding)
            # output shardings are inferred (states keep the scene sharding;
            # per-scene metrics shard the same way)
            self._step = jax.jit(step, in_shardings=(state_sharding,
                                                     param_sharding))
        else:
            self._step = jax.jit(step)
        self.last_metrics: StepMetrics | None = None
        self.frame = 0

    def step(self, n: int = 1) -> ParticleState:
        for _ in range(n):
            self.states, self.last_metrics = self._step(self.states,
                                                        self.params)
            self.frame += 1
        return self.states
