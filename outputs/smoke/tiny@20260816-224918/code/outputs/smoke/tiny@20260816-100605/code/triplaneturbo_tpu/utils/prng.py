"""Explicit PRNG threading helpers.

The reference scatters ``torch.randn`` calls through data loading and
training (e.g. noise sampling in
/root/reference/custom/triplaneturbo/systems/multiprompt_dual_renderer_multistep_generator.py:424-436).
The TPU-native design threads `jax.random` keys explicitly; these helpers keep
that ergonomic.
"""

from __future__ import annotations

from typing import Iterator

import jax


class KeySeq:
    """A splittable stream of PRNG keys: ``ks = KeySeq(seed); k = ks()``."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def take(self, n: int) -> jax.Array:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return jax.numpy.stack(subs)

    def __iter__(self) -> Iterator[jax.Array]:
        while True:
            yield self()


def per_process_key(seed: int) -> jax.Array:
    """Per-host key: fold the process index in (reference: seed + get_rank(),
    /root/reference/launch.py:168)."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), jax.process_index())
