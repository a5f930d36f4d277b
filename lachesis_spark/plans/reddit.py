"""Reddit-style comment-analytics pipeline.

Reference analog: the Reddit workload (reference src/reddit/headers/
RedditComment.h, RedditJoin.h; src/tests/source/TestRedditThreeWayJoin.cc):
load JSON comments, derive author features, three-way join, label.

Mapped onto the driver testdata: ``events`` plays the comment stream
(event_id=comment, user_id=author, value=score, props=JSON payload whose
``k`` field keys into ``documents``), ``documents`` plays the subreddit/post
table.  The JSON payload is parsed *in the engine* (get_json_object — the
reference hand-rolls this in C++), author features are a groupBy, and the
three-way join is comments ⋈ authors ⋈ documents with a CASE label.

Scale: authors is a pre-aggregated small dim (≤ distinct users) → broadcast;
documents joins on the extracted key; only the fact table shuffles, and only
once.  JSON extraction is a codegen expression, not a UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lachesis_spark.binding import base_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return base_table(spark, sf_dir, "events")


def comments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The comment stream with the JSON payload key extracted engine-side."""
    return _events(spark, sf_dir).select(
        F.col("event_id").alias("comment_id"),
        F.col("user_id").alias("author_id"),
        F.col("value").alias("score"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


def authors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Author feature extraction (reference RedditAuthor analog):
    comment count + average score, tiered."""
    return (
        comments(spark, sf_dir)
        .groupBy("author_id")
        .agg(F.count(F.lit(1)).alias("n_comments"), F.avg("score").alias("avg_score"))
        .withColumn(
            "tier",
            F.when(F.col("n_comments") >= 15, "heavy")
            .when(F.col("n_comments") >= 5, "regular")
            .otherwise("light"),
        )
    )


def reddit_pipeline(spark, sf_dir):
    """Three-way join comments ⋈ authors ⋈ documents + sentiment-ish label,
    aggregated to (source, tier, label) counts."""
    c = comments(spark, sf_dir)
    a = authors(spark, sf_dir)
    docs = base_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    joined = (
        c.join(F.broadcast(a), "author_id")
        .join(docs, c["k"] == docs["doc_id"])
        .withColumn("label", (F.col("score") > 0).cast("int"))
    )
    return (
        joined.groupBy("source", "tier", "label")
        .agg(
            F.count(F.lit(1)).alias("n_comments"),
            F.avg("score").alias("avg_score"),
        )
    )


REDDIT_PIPELINE_SQL = """
WITH c AS (
  SELECT event_id AS comment_id, user_id AS author_id, value AS score,
         CAST(props ->> 'k' AS BIGINT) AS k
  FROM events
),
a AS (
  SELECT author_id, count(*) AS n_comments, avg(score) AS avg_score,
         CASE WHEN count(*) >= 15 THEN 'heavy'
              WHEN count(*) >= 5 THEN 'regular'
              ELSE 'light' END AS tier
  FROM c GROUP BY author_id
)
SELECT d.source, a.tier, CAST(c.score > 0 AS INTEGER) AS label,
       count(*) AS n_comments, avg(c.score) AS avg_score
FROM c
JOIN a ON c.author_id = a.author_id
JOIN documents d ON c.k = d.doc_id
GROUP BY d.source, a.tier, label
"""


QUERIES = {"reddit_pipeline": reddit_pipeline}
ORACLE = {"reddit_pipeline": REDDIT_PIPELINE_SQL}
