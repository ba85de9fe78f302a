"""Auxiliary learning-rate schedules.

Reference: ``utils/learning_rate_scheduler.py:7-122``. The reference facade
uses torch's ExponentialLR instead (our optax schedule in
``models/nerf.py``); these are the standalone schedule utilities kept for
capability parity — each maps directly onto an ``optax`` schedule via
``as_optax()`` for the functional training path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Union

StateDict = Dict[str, Union[float, int]]


@dataclass
class ConstantLearningRateSchedule:
    """Reference ``:41-63``."""

    learning_rate: float

    def get_learning_rate(self, epoch: int) -> float:
        return self.learning_rate

    def load_state_dict(self, state: StateDict) -> None:
        self.learning_rate = state["learning_rate"]

    def as_optax(self) -> Callable[[int], float]:
        import optax
        return optax.constant_schedule(self.learning_rate)


@dataclass
class StepLearningRateSchedule:
    """Reference ``:66-97``: lr · decay^(epoch // frequency)."""

    learning_rate: float
    frequency: int
    decay_rate: float

    def get_learning_rate(self, epoch: int) -> float:
        return self.learning_rate * (self.decay_rate **
                                     (epoch // self.frequency))

    def load_state_dict(self, state: StateDict) -> None:
        self.learning_rate = state["learning_rate"]
        self.frequency = state["frequency"]
        self.decay_rate = state["decay_rate"]

    def as_optax(self) -> Callable[[int], float]:
        import optax
        return optax.exponential_decay(self.learning_rate,
                                       transition_steps=self.frequency,
                                       decay_rate=self.decay_rate,
                                       staircase=True)


@dataclass
class ExponentialRateSchedule:
    """Reference ``:100-122``: lr · decay^epoch."""

    learning_rate: float
    decay_rate: float

    def get_learning_rate(self, epoch: int) -> float:
        return self.learning_rate * (self.decay_rate ** epoch)

    def load_state_dict(self, state: StateDict) -> None:
        self.learning_rate = state["learning_rate"]
        self.decay_rate = state["decay_rate"]

    def as_optax(self) -> Callable[[int], float]:
        import optax
        return optax.exponential_decay(self.learning_rate,
                                       transition_steps=1,
                                       decay_rate=self.decay_rate)
