"""Timestep schedule samplers for diffusion training.

Parity with reference src/resample.py (vendored guided-diffusion capability,
unused by the reference's entry points but part of its surface): UniformSampler,
LossAwareSampler with cross-host loss synchronization, and
LossSecondMomentResampler (importance sampling by per-timestep loss second
moment). Pure-functional: samplers keep numpy state on host; the cross-rank
all_gather (:70-123) becomes a process_allgather on multi-host runs.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps
        self._weights = np.ones(num_timesteps, np.float64)

    def weights(self) -> np.ndarray:
        return self._weights

    def sample(self, batch_size: int, rng: np.random.RandomState
               ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (timesteps, importance weights) like the reference sample():
        weights w normalize so E[w * f(t)] = E[f(t)] under uniform t."""
        w = self.weights()
        p = w / w.sum()
        t = rng.choice(len(p), size=batch_size, p=p)
        iw = 1.0 / (len(p) * p[t])
        return t, iw


class LossAwareSampler(UniformSampler):
    def update_with_local_losses(self, local_ts: np.ndarray,
                                 local_losses: np.ndarray) -> None:
        """Synchronize losses across hosts then update (reference :70-123)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            local_ts = np.concatenate(
                multihost_utils.process_allgather(np.asarray(local_ts)))
            local_losses = np.concatenate(
                multihost_utils.process_allgather(np.asarray(local_losses)))
        self.update_with_all_losses(local_ts, local_losses)

    def update_with_all_losses(self, ts, losses) -> None:
        raise NotImplementedError


class LossSecondMomentResampler(LossAwareSampler):
    """Importance-sample timesteps proportional to sqrt(E[loss^2])
    (reference :124 ff)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        super().__init__(num_timesteps)
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros((num_timesteps, history_per_term),
                                      np.float64)
        self._loss_counts = np.zeros(num_timesteps, np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones(self.num_timesteps, np.float64)
        w = np.sqrt((self._loss_history ** 2).mean(axis=-1))
        w /= w.sum()
        w = w * (1 - self.uniform_prob) + self.uniform_prob / len(w)
        return w

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts).reshape(-1),
                           np.asarray(losses).reshape(-1)):
            t = int(t)
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1
