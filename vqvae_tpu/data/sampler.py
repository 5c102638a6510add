"""Batch samplers (reference main.py:70 / DataLoader semantics, utils.py:61-71).

Multi-host contract: every process constructs its sampler with the shared seed
plus its (num_shards, shard_id); each step all shards derive the SAME global
batch from the shared RNG stream and take disjoint contiguous slices of it, so
the union across hosts is exactly the single-host batch (tested in
tests/test_data.py::test_replacement_sampler_sharding). This is the
deterministic per-host input pipeline SURVEY.md §7 calls out as a multi-host
risk — determinism also lets crash-resume replay the schedule
(train/vqvae_train.py resume path).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def _shard_slice(batch: np.ndarray, num_shards: int, shard_id: int) -> np.ndarray:
    if num_shards <= 1:
        return batch
    if len(batch) % num_shards != 0:
        raise ValueError(
            f"global batch {len(batch)} not divisible by num_shards {num_shards}"
        )
    per = len(batch) // num_shards
    return batch[shard_id * per : (shard_id + 1) * per]


class ReplacementSampler:
    """Fresh independent draw per step.

    The reference calls ``next(iter(training_loader))`` every update
    (main.py:70) with shuffle=True — each step takes the first batch of a
    brand-new shuffle: i.i.d. sampling-with-replacement ACROSS steps, no
    duplicates WITHIN a batch. Reproduced with ``choice(replace=False)``
    per step (O(batch) instead of the reference's O(dataset) reshuffle).
    """

    def __init__(
        self,
        n: int,
        batch_size: int,
        seed: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        if batch_size > n:
            raise ValueError(f"batch_size {batch_size} > dataset size {n}")
        self.n = int(n)
        self.batch_size = int(batch_size)
        self.num_shards = int(num_shards)
        self.shard_id = int(shard_id)
        self._rng = np.random.default_rng(seed)

    def next_indices(self) -> np.ndarray:
        """This shard's slice of the next global batch (advances the shared
        RNG stream identically on every shard)."""
        batch = self._rng.choice(self.n, size=self.batch_size, replace=False)
        return _shard_slice(batch, self.num_shards, self.shard_id)


class EpochSampler:
    """Epoch traversal with optional shuffle / drop_last — torch DataLoader
    semantics for the prior's per-epoch loop (gated_pixelcnn.py:80,
    utils.py:61-71). Each ``epoch()`` call reshuffles (fresh permutation from
    the shared stream), matching a DataLoader re-iterated per epoch.
    """

    def __init__(
        self,
        n: int,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = False,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        self.n = int(n)
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.drop_last = bool(drop_last)
        self.num_shards = int(num_shards)
        self.shard_id = int(shard_id)
        self._rng = np.random.default_rng(seed)

    def epoch(self) -> Iterator[np.ndarray]:
        order = (
            self._rng.permutation(self.n)
            if self.shuffle
            else np.arange(self.n, dtype=np.int64)
        )
        b = self.batch_size
        end = (self.n // b) * b if self.drop_last else self.n
        for start in range(0, end, b):
            yield _shard_slice(
                order[start : start + b], self.num_shards, self.shard_id
            )

    def __iter__(self) -> Iterator[np.ndarray]:
        return self.epoch()


__all__ = ["EpochSampler", "ReplacementSampler"]
