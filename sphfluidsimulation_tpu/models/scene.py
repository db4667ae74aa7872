"""Scene — the user-facing simulation handle.

Plays the role of the reference's ``SphFluidSimulation`` MonoBehaviour
(Assets/Scripts/SphFluidSimulation.cs): owns the config, spawns the initial
state (``Start``, :82-94), and advances frames (``Update``, :96-108) — but as
an immutable functional wrapper around the jitted stepper instead of a
stateful component issuing GPU dispatches.
"""

from __future__ import annotations

from typing import Iterator

import jax

from ..config import SimConfig
from ..state import ParticleState, StepMetrics
from ..sim.stepper import initial_state, make_frame_step


class Scene:
    def __init__(self, cfg: SimConfig | None = None, *, neighbor: str = "slotted",
                 faithful: bool = True, jit: bool = True):
        self.cfg = (cfg or SimConfig()).validate()
        self.neighbor = neighbor
        step = make_frame_step(self.cfg, neighbor=neighbor, faithful=faithful)
        self._step = jax.jit(step) if jit else step
        self.state: ParticleState = initial_state(self.cfg)
        self.last_metrics: StepMetrics | None = None
        self.frame = 0

    def reset(self) -> ParticleState:
        self.state = initial_state(self.cfg)
        self.frame = 0
        return self.state

    def step(self, n: int = 1) -> ParticleState:
        for _ in range(n):
            self.state, self.last_metrics = self._step(self.state)
            self.frame += 1
        return self.state

    def frames(self, n: int) -> Iterator[ParticleState]:
        for _ in range(n):
            yield self.step()
