"""Gate query for connected components / dedup clustering
(operators/graph.py).

Edge rule (deterministic, data-derived): two documents are "near dups"
when they share a language and their lengths differ by ≤ 2 chars.
Length chains make transitivity do real work — doc A links B links C
even when A and C differ by 4 — which is exactly the closure connected
components exist to compute.  The oracle is an independent algorithm: a
recursive-CTE reachability closure + MIN per node, against the engine's
alternating large-star/small-star contraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.graph import dedup_clusters

_MAX_DIFF = 2


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "n_chars")
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (a.join(b, (F.col("a.lang") == F.col("b.lang"))
                    & (F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
                       <= _MAX_DIFF)
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("src"),
                     F.col("b.doc_id").alias("dst")))
    return (dedup_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
            .select("doc_id", "component", "is_representative"))


def sql_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT a.doc_id AS x, b.doc_id AS y
  FROM documents a JOIN documents b
    ON a.lang = b.lang
   AND abs(a.n_chars - b.n_chars) <= {_MAX_DIFF}
   AND a.doc_id <> b.doc_id
), r AS (
  SELECT doc_id AS node, doc_id AS comp FROM documents
  UNION
  SELECT e.y, r.comp FROM r JOIN e ON e.x = r.node
)
SELECT node AS doc_id,
       MIN(comp) AS component,
       MIN(comp) = node AS is_representative
FROM r GROUP BY node"""


GRAPH_QUERIES = {
    "dedup_clusters": (q_dedup_clusters, sql_dedup_clusters),
}
