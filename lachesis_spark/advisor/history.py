"""Workload-history store (SQLite).

Schema modeled on the reference's self-learning DB
(reference src/selfLearning/source/SelfLearningDB.cc:109-148: jobs, their
TCAP, lambdas and run statistics): a ``jobs`` table with runtimes and a
``key_usage`` table recording which dataset was joined / aggregated /
partitioned on which key columns during that job.  The recommender reads
nothing else — runtime-weighted key frequency is the whole signal, as in the
reference's rule-based optimizer.
"""

from __future__ import annotations

import sqlite3
import time
from collections.abc import Sequence
from dataclasses import dataclass

_SCHEMA = """
CREATE TABLE IF NOT EXISTS jobs (
  id          INTEGER PRIMARY KEY AUTOINCREMENT,
  name        TEXT NOT NULL,
  created_at  REAL NOT NULL,
  runtime_sec REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS key_usage (
  job_id   INTEGER NOT NULL REFERENCES jobs(id),
  dataset  TEXT NOT NULL,
  op       TEXT NOT NULL,      -- 'join' | 'aggregate' | 'partition'
  key_cols TEXT NOT NULL       -- comma-joined, order-normalized
);
CREATE INDEX IF NOT EXISTS key_usage_dataset ON key_usage(dataset);
CREATE TABLE IF NOT EXISTS scan_stats (
  job_id      INTEGER NOT NULL REFERENCES jobs(id),
  dataset     TEXT NOT NULL,
  n_files     INTEGER NOT NULL,
  total_bytes INTEGER NOT NULL
);
CREATE INDEX IF NOT EXISTS scan_stats_dataset ON scan_stats(dataset);
CREATE TABLE IF NOT EXISTS key_stats (
  job_id     INTEGER NOT NULL REFERENCES jobs(id),
  dataset    TEXT NOT NULL,
  key_cols   TEXT NOT NULL,     -- comma-joined, order-normalized
  n_rows     INTEGER NOT NULL,
  n_distinct INTEGER NOT NULL,
  top_cnt    INTEGER NOT NULL   -- row count of the hottest key value
);
CREATE INDEX IF NOT EXISTS key_stats_dataset ON key_stats(dataset);
"""


@dataclass(frozen=True)
class ScanStat:
    """Physical shape of one dataset as observed by one job's scan."""

    dataset: str
    n_files: int
    total_bytes: int


@dataclass(frozen=True)
class KeyStat:
    """Frequency profile of one key of one dataset (hot-key signal).

    ``top_cnt / n_rows`` is the hottest key value's row share — the number
    that decides whether a shuffle on this key stragglers (one partition
    owning that share of the stage) and how many salts spread it."""

    dataset: str
    key_cols: tuple[str, ...]
    n_rows: int
    n_distinct: int
    top_cnt: int

    @property
    def key_text(self) -> str:
        return ",".join(sorted(self.key_cols))

    @property
    def top_share(self) -> float:
        return self.top_cnt / self.n_rows if self.n_rows else 0.0


@dataclass(frozen=True)
class KeyUsage:
    """One (dataset, operation, key) observation from one job."""

    dataset: str
    op: str
    key_cols: tuple[str, ...]

    @property
    def key_text(self) -> str:
        return ",".join(sorted(self.key_cols))


class HistoryDB:
    """Embedded job-history store; ``path=':memory:'`` for tests."""

    def __init__(self, path: str):
        self.con = sqlite3.connect(path)
        self.con.executescript(_SCHEMA)

    def record_job(
        self,
        name: str,
        runtime_sec: float,
        usages: Sequence[KeyUsage],
        scans: Sequence[ScanStat] = (),
        key_stats: Sequence[KeyStat] = (),
    ) -> int:
        cur = self.con.execute(
            "INSERT INTO jobs (name, created_at, runtime_sec) VALUES (?, ?, ?)",
            (name, time.time(), runtime_sec),
        )
        job_id = cur.lastrowid
        self.con.executemany(
            "INSERT INTO key_usage (job_id, dataset, op, key_cols) VALUES (?, ?, ?, ?)",
            [(job_id, u.dataset, u.op, u.key_text) for u in usages],
        )
        self.con.executemany(
            "INSERT INTO scan_stats (job_id, dataset, n_files, total_bytes)"
            " VALUES (?, ?, ?, ?)",
            [(job_id, s.dataset, s.n_files, s.total_bytes) for s in scans],
        )
        self.con.executemany(
            "INSERT INTO key_stats"
            " (job_id, dataset, key_cols, n_rows, n_distinct, top_cnt)"
            " VALUES (?, ?, ?, ?, ?, ?)",
            [
                (job_id, k.dataset, k.key_text, k.n_rows, k.n_distinct, k.top_cnt)
                for k in key_stats
            ],
        )
        self.con.commit()
        return job_id

    def key_profiles(self, dataset: str) -> list[KeyStat]:
        """Latest recorded frequency profile per key of ``dataset``."""
        rows = self.con.execute(
            """
            SELECT key_cols, n_rows, n_distinct, top_cnt
            FROM key_stats s
            WHERE dataset = ?
              AND job_id = (SELECT max(job_id) FROM key_stats
                            WHERE dataset = ? AND key_cols = s.key_cols)
            """,
            (dataset, dataset),
        ).fetchall()
        return [
            KeyStat(dataset, tuple(k.split(",")), n, d, t)
            for k, n, d, t in rows
        ]

    def key_weights(self, dataset: str) -> dict[str, float]:
        """Total runtime (seconds) of jobs that used each key of ``dataset``
        in a shuffle-inducing op — the rule-based optimizer's ranking signal
        (reference RuleBasedDataPlacementOptimizerForLoadJob.h:15-53)."""
        rows = self.con.execute(
            """
            SELECT u.key_cols, sum(j.runtime_sec)
            FROM key_usage u JOIN jobs j ON u.job_id = j.id
            WHERE u.dataset = ?
              AND u.op IN ('join', 'aggregate', 'partition', 'shuffle')
            GROUP BY u.key_cols
            """,
            (dataset,),
        ).fetchall()
        return {k: w for k, w in rows}

    def filter_weights(self, dataset: str) -> dict[str, float]:
        """Total runtime of jobs that pushed a scan filter on each column of
        ``dataset`` — the signal for data-skipping layout (Z-order) choices,
        which shuffle keys say nothing about."""
        rows = self.con.execute(
            """
            SELECT u.key_cols, sum(j.runtime_sec)
            FROM key_usage u JOIN jobs j ON u.job_id = j.id
            WHERE u.dataset = ? AND u.op = 'filter'
            GROUP BY u.key_cols
            """,
            (dataset,),
        ).fetchall()
        return {k: w for k, w in rows}

    def scan_profile(self, dataset: str) -> tuple[int, int, float] | None:
        """(latest n_files, latest total_bytes, total runtime-sec of jobs
        that scanned the dataset) — the signal for the page/file-size
        dimension of placement (the reference's optimizer picks a page size
        alongside the partition lambda,
        RuleBasedDataPlacementOptimizerForLoadJob.h:15)."""
        row = self.con.execute(
            """
            SELECT s.n_files, s.total_bytes
            FROM scan_stats s WHERE s.dataset = ?
            ORDER BY s.job_id DESC LIMIT 1
            """,
            (dataset,),
        ).fetchone()
        if row is None:
            return None
        weight = self.con.execute(
            """
            SELECT coalesce(sum(j.runtime_sec), 0.0)
            FROM jobs j WHERE j.id IN
              (SELECT DISTINCT job_id FROM scan_stats WHERE dataset = ?)
            """,
            (dataset,),
        ).fetchone()[0]
        return (int(row[0]), int(row[1]), float(weight))

    def co_shuffle_partners(
        self, dataset: str, key_text: str
    ) -> list[tuple[str, str, float]]:
        """The join partners of (dataset, key) — the table (and ITS key) a
        co-partitioning layout must also be applied to for a bucket join to
        plan exchange-free.  Primary signal: 'joinpair' usages captured
        from SortMergeJoin/ShuffledHashJoin key lists in executed plans
        (dataset "left>right", key "lcols>rcols"), which pin which two
        shuffles actually MEET — a job with three shuffles is ambiguous
        otherwise (tpch_q03 shuffles orders on o_custkey for the customer
        join in the same job that shuffles lineitem on l_orderkey, and the
        co-occurrence heuristic would pin the wrong key).  Falls back to
        same-job co-shuffle co-occurrence for histories recorded without
        joinpair capture.  Returns [(partner_dataset, partner_key_text,
        total_runtime_sec)] sorted by weight descending."""
        rows = self.con.execute(
            """
            SELECT u.dataset, u.key_cols, sum(j.runtime_sec)
            FROM key_usage u JOIN jobs j ON u.job_id = j.id
            WHERE u.op = 'joinpair'
              AND (u.dataset LIKE ? || '>%' OR u.dataset LIKE '%>' || ?)
            GROUP BY u.dataset, u.key_cols
            ORDER BY sum(j.runtime_sec) DESC, u.dataset
            """,
            (dataset, dataset),
        ).fetchall()
        merged: dict[tuple[str, str], float] = {}
        for ds_pair, key_pair, w in rows:
            left_ds, right_ds = ds_pair.split(">", 1)
            left_k, right_k = key_pair.split(">", 1)
            if left_ds == dataset and left_k == key_text:
                hit = (right_ds, right_k)
            elif right_ds == dataset and right_k == key_text:
                hit = (left_ds, left_k)
            else:
                continue
            # the same logical join records under both orientations
            # (build/probe sides flip between plans) — fold the weights
            merged[hit] = merged.get(hit, 0.0) + float(w)
        if merged:
            return sorted(
                ((d, k, w) for (d, k), w in merged.items()),
                key=lambda t: (-t[2], t[0], t[1]),
            )
        rows = self.con.execute(
            """
            SELECT p.dataset, p.key_cols, sum(j.runtime_sec)
            FROM key_usage u
            JOIN key_usage p ON p.job_id = u.job_id
            JOIN jobs j ON j.id = u.job_id
            WHERE u.dataset = ? AND u.key_cols = ?
              AND u.op = 'shuffle' AND p.op = 'shuffle'
              AND p.dataset != u.dataset
            GROUP BY p.dataset, p.key_cols
            ORDER BY sum(j.runtime_sec) DESC, p.dataset
            """,
            (dataset, key_text),
        ).fetchall()
        return [(d, k, float(w)) for d, k, w in rows]

    def datasets(self) -> list[str]:
        # joinpair usages record PAIR pseudo-datasets ('left>right') so
        # partner pins survive round trips; they are join metadata, not
        # advisable datasets, so they never surface here.
        return [
            r[0]
            for r in self.con.execute(
                "SELECT DISTINCT dataset FROM key_usage"
                " WHERE op != 'joinpair' ORDER BY dataset"
            )
        ]

    def close(self) -> None:
        self.con.close()
