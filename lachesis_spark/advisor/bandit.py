"""Adaptive data-placement optimizer (the reference's DRL variant).

Reference: DRLBasedDataPlacementOptimizerForLoadJob + the A3C server
(reference src/selfLearning/headers/DRLBasedDataPlacementOptimizerForLoadJob.h,
scripts/pangeaDeepRL/rlServer.py:4,23-26,120-140) — the learned policy makes
the *same decision* as the rule-based optimizer (which partitioning lambda
to pre-partition a dataset with) but improves from observed outcomes.

Here the decision surface is kept and the learner simplified to an
ε-greedy bandit over candidate keys: rewards are measured relative runtime
improvements after applying a layout, persisted in the history DB, and the
policy exploits the best observed mean reward while exploring alternatives
with probability ε.  Deterministic under a seed, so it is testable offline —
the property the reference's A3C setup lacks (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import random

from lachesis_spark.advisor.history import HistoryDB
from lachesis_spark.advisor.recommender import Recommendation

_REWARDS_SCHEMA = """
CREATE TABLE IF NOT EXISTS layout_rewards (
  dataset  TEXT NOT NULL,
  key_cols TEXT NOT NULL,
  reward   REAL NOT NULL
);
CREATE INDEX IF NOT EXISTS layout_rewards_dataset ON layout_rewards(dataset);
"""


class BanditPlacementOptimizer:
    """ε-greedy policy over a dataset's historically-used keys."""

    def __init__(self, history: HistoryDB, epsilon: float = 0.1, seed: int = 0):
        self.history = history
        self.epsilon = epsilon
        self.rng = random.Random(seed)
        history.con.executescript(_REWARDS_SCHEMA)

    # -- learning ----------------------------------------------------------
    def observe(
        self,
        dataset: str,
        key_cols: tuple[str, ...],
        runtime_before: float,
        runtime_after: float,
    ) -> float:
        """Record the outcome of applying a layout: reward = relative
        runtime improvement of the consuming workload."""
        reward = (runtime_before - runtime_after) / max(runtime_before, 1e-9)
        self.history.con.execute(
            "INSERT INTO layout_rewards (dataset, key_cols, reward) VALUES (?, ?, ?)",
            (dataset, ",".join(sorted(key_cols)), reward),
        )
        self.history.con.commit()
        return reward

    def mean_rewards(self, dataset: str) -> dict[str, float]:
        rows = self.history.con.execute(
            "SELECT key_cols, avg(reward) FROM layout_rewards WHERE dataset = ?"
            " GROUP BY key_cols",
            (dataset,),
        ).fetchall()
        return dict(rows)

    # -- decision ----------------------------------------------------------
    def candidates(self, dataset: str) -> list[str]:
        """Keys worth considering: everything the workload history has
        joined/aggregated/partitioned this dataset on."""
        return sorted(self.history.key_weights(dataset))

    def choose(self, dataset: str, n_buckets: int = 32) -> Recommendation | None:
        cands = self.candidates(dataset)
        if not cands:
            return None
        rewards = self.mean_rewards(dataset)
        unexplored = [k for k in cands if k not in rewards]
        if unexplored:
            # always try an untested layout first (optimistic init)
            key = unexplored[0]
        elif self.rng.random() < self.epsilon:
            key = self.rng.choice(cands)
        else:
            # exploit best observed mean reward; runtime-weight breaks ties
            weights = self.history.key_weights(dataset)
            key = max(cands, key=lambda k: (rewards.get(k, 0.0), weights.get(k, 0.0), k))
        weight = self.history.key_weights(dataset).get(key, 0.0)
        return Recommendation(dataset, tuple(key.split(",")), weight, n_buckets)
