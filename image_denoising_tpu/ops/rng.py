"""Counter-based operation seeding.

The reference seeds every random op with a fresh generator derived from an
incrementing global counter (``train.py:56-61``; the counter itself is only
defined in ``training_script.md:4`` and commented out in ``train.py:43`` — a
latent NameError we fix rather than copy). The JAX equivalent derives a fresh
PRNG key per op from (base_seed, counter), giving the same reproducibility
property: the n-th random op of a run is a pure function of the run seed.
"""
from __future__ import annotations

import jax

__all__ = ["OperationSeed"]


class OperationSeed:
    """Stateful per-op key source: ``keys.next()`` → fresh PRNGKey.

    Host-side state (a plain int counter); the returned keys are fed into
    jitted functions as arguments so tracing stays pure.
    """

    def __init__(self, base_seed: int = 0):
        self.base_seed = int(base_seed)
        self.counter = 0
        self._base_key = jax.random.PRNGKey(self.base_seed)

    def next(self) -> jax.Array:
        self.counter += 1
        return jax.random.fold_in(self._base_key, self.counter)

    def next_n(self, n: int):
        return [self.next() for _ in range(n)]

    def state(self) -> dict:
        return {"base_seed": self.base_seed, "counter": self.counter}

    @classmethod
    def from_state(cls, state: dict) -> "OperationSeed":
        obj = cls(state["base_seed"])
        obj.counter = int(state["counter"])
        return obj
