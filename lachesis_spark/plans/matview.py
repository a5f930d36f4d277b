"""Materialized aggregate views with INCREMENTAL refresh.

The warehouse primitive on top of the catalog: ``create_agg_view``
materializes a group-by aggregate of a stored set; ``refresh_view``
brings it up to date after appends by aggregating ONLY the new files and
folding the delta into the stored state.  (The reference has no view
layer; this is part of the engine-level catalog surface, same status as
snapshots/CDC.)

Mechanics — the Delta/Materialize pattern on plain parquet:

- The view definition (source set, keys, tracked value columns) and a
  FILE-LEVEL WATERMARK (the exact source file names consumed) live in a
  ``_lachesis_mv.json`` sidecar next to the view's state set.
- The state holds DECOMPOSABLE aggregate state per key: count, sum, min,
  max for each tracked column (avg and friends derive at read time).
  These fold associatively, so delta ∘ state = state′ needs one
  groups-sized union+re-aggregate — O(groups + delta), never O(source).
- ``refresh_view`` diffs the source directory against the watermark:
  only NEW files are scanned (``spark.read.parquet(*new_files)``) —
  an appended 100 GB day folds into a 100 TB corpus's view for the cost
  of the day, not the corpus.
- If any consumed file has VANISHED (the source was rewritten by
  merge/compact/CDC — appends never remove files), incremental folding
  would double- or under-count; refresh detects it from the watermark
  and falls back to a full recompute, loudly correct rather than
  silently wrong.

Scale: the state set is keys-sized; its rewrite per refresh is O(groups).
For group counts that rival the source itself, the same fold runs
through ``Catalog.apply_cdc`` on a partitioned state (the delta becomes
an upsert batch keyed by the group) — the state here is small enough
that the direct rewrite is the simpler correct tool.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lachesis_spark.binding import base_table

from lachesis_spark.operators.core import barrier as _barrier

MV_FILE = "_lachesis_mv.json"

# Named row-transforms applied to the scanned source BEFORE aggregation —
# the view definition's "query body".  Registered by NAME (the sidecar must
# survive process restarts, so it stores the name, not the function); a
# transform must be deterministic and PER-ROW/PER-FILE (no cross-file
# state), which is exactly what makes per-file delta folding sound.
TRANSFORMS: dict = {}


def register_transform(name: str, fn) -> None:
    TRANSFORMS[name] = fn


def _source_files(cat, db: str, name: str) -> list[str]:
    path = cat.set_path(db, name)
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") or (
                f.startswith("part-") and not f.endswith(".crc")
            ):
                out.append(os.path.join(root, f))
    return sorted(out)


def _state_agg(df: DataFrame, keys: list[str], cols: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias("mv_count")]
    for c in cols:
        aggs += [
            F.sum(c).cast("double").alias(f"sum_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def _fold(state: DataFrame, delta: DataFrame, keys: list[str], cols: list[str]) -> DataFrame:
    merged = state.unionByName(delta)
    aggs = [F.sum("mv_count").cast("long").alias("mv_count")]
    for c in cols:
        aggs += [
            F.sum(f"sum_{c}").cast("double").alias(f"sum_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
        ]
    return merged.groupBy(*keys).agg(*aggs)


def _mv_path(cat, db: str, view: str) -> str:
    return os.path.join(cat.set_path(db, view), MV_FILE)


def create_agg_view(
    cat,
    db: str,
    view: str,
    src_db: str,
    src_name: str,
    keys: list[str],
    cols: list[str],
    bucket_by: tuple[int, list[str]] | None = None,
    transform: str | None = None,
) -> None:
    """Materialize count/sum/min/max per ``keys`` over ``cols`` of the
    source set, recording the consumed-file watermark.

    ``bucket_by`` lays the STATE out co-partitioned (persisted through
    every refresh) — e.g. an inverted index is exactly an MV with
    keys=(doc_id, term) bucketed by term: searches prune to their terms'
    buckets and per-term aggs plan no Exchange, while appends of new
    documents fold in incrementally like any other view."""
    spark = cat.spark
    files = _source_files(cat, src_db, src_name)
    df = spark.read.parquet(*files)
    if transform is not None:
        df = TRANSFORMS[transform](df)
    cat.write_set(_state_agg(df, keys, cols), db, view, bucket_by=bucket_by)
    meta = {
        "src": [src_db, src_name],
        "keys": list(keys),
        "cols": list(cols),
        "bucket_by": [bucket_by[0], list(bucket_by[1])] if bucket_by else None,
        "transform": transform,
        "consumed": [os.path.basename(f) for f in files],
    }
    with open(_mv_path(cat, db, view), "w") as fh:
        json.dump(meta, fh)


def refresh_view(cat, db: str, view: str) -> str:
    """Bring the view up to date.  Returns the refresh mode actually used:
    ``"noop"`` (nothing new), ``"incremental"`` (delta fold over new files
    only), or ``"full"`` (source was rewritten — consumed files vanished —
    so the state is recomputed from scratch)."""
    spark = cat.spark
    with open(_mv_path(cat, db, view)) as fh:
        meta = json.load(fh)
    src_db, src_name = meta["src"]
    keys, cols = meta["keys"], meta["cols"]
    bucket_by = meta.get("bucket_by")
    if bucket_by:
        bucket_by = (bucket_by[0], list(bucket_by[1]))
    files = _source_files(cat, src_db, src_name)
    names = [os.path.basename(f) for f in files]
    consumed = set(meta["consumed"])
    if not consumed <= set(names):
        # a consumed file is gone: the source was rewritten, not appended —
        # incremental folding would be wrong; recompute fully
        create_agg_view(
            cat, db, view, src_db, src_name, keys, cols,
            bucket_by=bucket_by, transform=meta.get("transform"),
        )
        return "full"
    new = [f for f in files if os.path.basename(f) not in consumed]
    if not new:
        return "noop"
    # fold the delta: ONLY the new files are scanned
    delta_df = spark.read.parquet(*new)
    if meta.get("transform"):
        delta_df = TRANSFORMS[meta["transform"]](delta_df)
    delta = _state_agg(delta_df, keys, cols)
    state = cat.read_set(db, view)
    folded = _fold(state, delta, keys, cols).transform(_barrier, eager=True)
    cat.write_set(folded, db, view, bucket_by=bucket_by)
    meta["consumed"] = names
    with open(_mv_path(cat, db, view), "w") as fh:
        json.dump(meta, fh)
    return "incremental"


def read_view(cat, db: str, view: str, avg_of: list[str] | None = None) -> DataFrame:
    """The view's query surface: raw state plus derived averages."""
    df = cat.read_set(db, view)
    for c in avg_of or []:
        df = df.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("mv_count"))
    return df


# ---------------------------------------------------------------------------
# registry query: create on a partial source, append the rest, refresh
# incrementally, and prove the folded state equals the full-table aggregate
def mv_incremental(spark: SparkSession, sf_dir: str):
    """Incremental MV lifecycle: materialize over ⅔ of orders, append the
    remaining ⅓ as a second batch, ``refresh_view`` folds ONLY the new
    files — and the result hash-matches DuckDB's aggregate over the WHOLE
    table, which is exactly the claim an incremental view must uphold."""
    import tempfile

    from lachesis_spark.catalog import Catalog

    cat = Catalog(spark, tempfile.mkdtemp(prefix="lachesis_mv_"))
    cat.create_database("mv")
    orders = base_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    rest = orders.filter(F.col("o_orderkey") % 3 == 0)
    cat.write_set(base.repartition(4), "mv", "orders_src")
    create_agg_view(
        cat, "mv", "orders_by_status", "mv", "orders_src",
        ["o_orderstatus"], ["o_totalprice"],
    )
    # append-only growth: new parquet files land in the set's directory
    rest.repartition(2).write.mode("append").parquet(
        cat.set_path("mv", "orders_src")
    )
    mode = refresh_view(cat, "mv", "orders_by_status")
    if mode != "incremental":  # defensive: the demo IS the incremental path
        raise RuntimeError(f"expected incremental refresh, got {mode}")
    out = read_view(cat, "mv", "orders_by_status", avg_of=["o_totalprice"])
    return out.select(
        "o_orderstatus",
        "mv_count",
        F.round("sum_o_totalprice", 2).alias("sum_price"),
        F.round("min_o_totalprice", 2).alias("min_price"),
        F.round("max_o_totalprice", 2).alias("max_price"),
        F.round("avg_o_totalprice", 4).alias("avg_price"),
    )


MV_INCREMENTAL_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS mv_count,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS sum_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       round(CAST(sum(o_totalprice) AS DOUBLE) / count(*), 4) AS avg_price
FROM orders
GROUP BY o_orderstatus
"""

QUERIES = {"mv_incremental": mv_incremental}
ORACLE = {"mv_incremental": MV_INCREMENTAL_SQL}
