"""Adaptive data-placement optimizer (the reference's DRL variant).

Reference: DRLBasedDataPlacementOptimizerForLoadJob + the A3C server
(reference src/selfLearning/headers/DRLBasedDataPlacementOptimizerForLoadJob.h,
scripts/pangeaDeepRL/rlServer.py:4,23-26,120-140) — the learned policy makes
the *same decision* as the rule-based optimizer (which partitioning lambda
to pre-partition a dataset with) but improves from observed outcomes.

Two learners share the decision surface:

* :class:`BanditPlacementOptimizer` — context-free ε-greedy over candidate
  keys; rewards are measured relative runtime improvements, persisted in
  the history DB.
* :class:`LinUCBPlacementOptimizer` — CONTEXTUAL bandit (LinUCB, Li et al.
  2010, public literature): each candidate layout is described by a state
  feature vector (table bytes, file count, key cardinality, runtime weight
  — the features the reference's DRL state carried) and a shared ridge-
  regression value model scores expected reward with an optimism bonus.
  Because the model is over FEATURES, not arm identities, what it learns
  on one dataset transfers to an unseen one — the property that made the
  reference's RL interesting, here in a deterministic, offline-testable
  form (no A3C server, no nondeterministic rollouts — SURVEY.md §7
  "hard parts").
"""

from __future__ import annotations

import json
import math
import random
from dataclasses import dataclass

from lachesis_spark.advisor.history import HistoryDB
from lachesis_spark.advisor.recommender import Recommendation

_REWARDS_SCHEMA = """
CREATE TABLE IF NOT EXISTS layout_rewards (
  dataset  TEXT NOT NULL,
  key_cols TEXT NOT NULL,
  reward   REAL NOT NULL
);
CREATE INDEX IF NOT EXISTS layout_rewards_dataset ON layout_rewards(dataset);
CREATE TABLE IF NOT EXISTS layout_ctx_rewards (
  dataset  TEXT NOT NULL,
  key_cols TEXT NOT NULL,
  features TEXT NOT NULL,   -- JSON-encoded feature vector
  reward   REAL NOT NULL
);
CREATE INDEX IF NOT EXISTS layout_ctx_rewards_dataset
  ON layout_ctx_rewards(dataset);
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


# ---------------------------------------------------------------------------
# Contextual bandit (LinUCB)
@dataclass(frozen=True)
class PlacementContext:
    """State features for one candidate (dataset, key) placement decision —
    the observation the reference's DRL state carried (table size, file
    shape, key properties; rlServer.py:120-140 feeds the analog through the
    A3C network)."""

    total_bytes: int
    n_files: int
    key_cardinality: int
    runtime_weight: float  # fraction of the workload's runtime behind this key

    def vector(self) -> list[float]:
        """Feature map.  Logs compress the heavy-tailed size features; the
        leading 1 is the bias term.  Cardinality is the feature frequency-
        based rules lack: bucketing a 3-value key wins no parallelism no
        matter how often the workload touches it."""
        return [
            1.0,
            math.log10(max(self.total_bytes, 1)),
            math.log10(max(self.n_files, 1)),
            math.log10(max(self.key_cardinality, 1)),
            min(max(self.runtime_weight, 0.0), 1.0),
        ]


def measure_key_cardinality(df, key_cols) -> int:
    """Distinct-count of a candidate layout key (one agg job; at 100 TB use
    approx_count_distinct — exactness doesn't matter, the feature is log10)."""
    from pyspark.sql import functions as F

    return int(df.select(*key_cols).agg(
        F.approx_count_distinct(F.struct(*[F.col(c) for c in key_cols])).alias("c")
    ).first()["c"])


class LinUCBPlacementOptimizer:
    """LinUCB over placement decisions: shared ridge model θ = A⁻¹b with
    optimism bonus α√(xᵀA⁻¹x).  Deterministic (optimism drives exploration
    — no RNG), persistent (observations rebuild A, b from SQLite), and
    feature-general (transfers across datasets)."""

    DIM = 5

    def __init__(self, history: HistoryDB, alpha: float = 0.8, ridge: float = 1.0):
        import numpy as np

        self.history = history
        self.alpha = alpha
        history.con.executescript(_REWARDS_SCHEMA)
        self._A = np.eye(self.DIM) * ridge
        self._b = np.zeros(self.DIM)
        for feats, reward in history.con.execute(
            "SELECT features, reward FROM layout_ctx_rewards"
        ).fetchall():
            x = np.asarray(json.loads(feats))
            self._A += np.outer(x, x)
            self._b += reward * x

    # -- learning ----------------------------------------------------------
    def observe(
        self,
        dataset: str,
        key_cols: tuple[str, ...],
        context: PlacementContext,
        runtime_before: float,
        runtime_after: float,
    ) -> float:
        """Reward = relative runtime improvement of the consuming workload
        after applying the layout, credited to the layout's features."""
        import numpy as np

        reward = (runtime_before - runtime_after) / max(runtime_before, 1e-9)
        x = np.asarray(context.vector())
        self.history.con.execute(
            "INSERT INTO layout_ctx_rewards (dataset, key_cols, features, reward)"
            " VALUES (?, ?, ?, ?)",
            (dataset, ",".join(sorted(key_cols)), json.dumps(context.vector()),
             reward),
        )
        self.history.con.commit()
        self._A += np.outer(x, x)
        self._b += reward * x
        return reward

    # -- decision ----------------------------------------------------------
    def predict(self, context: PlacementContext) -> float:
        """Point estimate θᵀx (no optimism) — what the model believes this
        placement is worth.  Usable for cold-start ranking on an unseen
        dataset."""
        import numpy as np

        theta = np.linalg.solve(self._A, self._b)
        return float(theta @ np.asarray(context.vector()))

    def ucb(self, context: PlacementContext) -> float:
        import numpy as np

        x = np.asarray(context.vector())
        theta = np.linalg.solve(self._A, self._b)
        return float(theta @ x + self.alpha * math.sqrt(x @ np.linalg.solve(self._A, x)))

    def choose(
        self,
        dataset: str,
        contexts: dict[str, PlacementContext],
        n_buckets: int = 32,
    ) -> Recommendation | None:
        """Pick the key whose context maximizes the UCB score (deterministic
        tie-break on key text).  ``contexts`` maps comma-joined key text →
        features, normally built from the history's scan stats + a
        cardinality measurement."""
        if not contexts:
            return None
        key = max(sorted(contexts), key=lambda k: (self.ucb(contexts[k]), k))
        weight = self.history.key_weights(dataset).get(key, 0.0)
        return Recommendation(dataset, tuple(key.split(",")), weight, n_buckets)


def candidate_id(cand) -> str:
    """Stable identity of a layout candidate for context keying: two
    candidates can share key_cols (bucket_by vs bucket_range_grid on the
    same join key), so the kind participates."""
    rng = f";range={','.join(cand.range_cols)}" if cand.range_cols else ""
    return f"{cand.kind}:{','.join(cand.key_cols)}{rng}"


def arbitrate_by_reward(
    linucb: "LinUCBPlacementOptimizer",
    dataset: str,
    candidates: list,
    contexts: dict[str, PlacementContext],
    measure,
):
    """Measured-payoff arbitration of CONTESTED layout candidates — the
    reference's DRL-optimizer decision surface
    (DRLBasedDataPlacementOptimizerForLoadJob.h: choose the placement by
    modeled payoff, not by a fixed rule precedence), in the deterministic
    LinUCB form.

    For each candidate, ``measure(cand) -> (workload_sec_before,
    workload_sec_after)`` runs the recorded workload's representative
    queries against a copy of the dataset placed under that candidate
    (before = the unplaced copy).  Each outcome is observed into the
    shared LinUCB value model — reward = relative runtime improvement,
    credited to the candidate's FEATURE vector so the lesson TRANSFERS to
    datasets that will NOT be measured (the model's UCB ranks cold-start
    candidates elsewhere).  Among candidates that were just measured
    directly, the choice is the measured-reward argmax: a direct
    observation of the payoff dominates the 5-feature model's
    interpolation of it (three near-collinear contexts can rank-invert
    under ridge shrinkage — observed in the round-10 run, where the model
    briefly preferred a 0.10-reward arm over the 0.23-reward one).
    Returns the winning candidate."""
    by_id = {candidate_id(c): c for c in candidates}
    missing = sorted(set(by_id) - set(contexts))
    if missing:
        raise ValueError(f"no context for candidates: {missing}")
    rewards: dict[str, float] = {}
    for cid in sorted(by_id):
        before, after = measure(by_id[cid])
        rewards[cid] = linucb.observe(
            dataset, by_id[cid].key_cols, contexts[cid], before, after
        )
    best = max(sorted(by_id), key=lambda cid: rewards[cid])
    return by_id[best]
