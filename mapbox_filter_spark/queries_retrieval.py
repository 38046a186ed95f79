"""Gate query for BM25 retrieval (operators/retrieval.py).

The oracle recomputes the full pipeline — tokenize, tf/dl, df, idf,
BM25 sum, top-k — in SQL with the identical formula; ``avgdl`` is
written as SUM/COUNT (not AVG) in both engines so the division is the
same exact-int-to-double operation.  Scores rounded to 4 dp (the ln/
division chain agrees to the last ulp across engines; ranking happens
on the UNROUNDED score with doc_id tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.retrieval import bm25_topk

_QUERY = ["spark", "table", "scan"]
_K = 20
_K1, _B = 1.2, 0.75


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = bm25_topk(docs, list(_QUERY), k=_K, k1=_K1, b=_B)
    return top.select("doc_id", F.round("score", 4).alias("score"),
                      "rank")


def sql_bm25_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY)
    return f"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
toks AS (SELECT doc_id, unnest(ws) AS term FROM words),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
qdf AS (
  SELECT term, COUNT(*) AS df FROM tf
  WHERE term IN ({terms}) GROUP BY 1
),
scored AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5)
                       / (qdf.df + 0.5))
             * tf.tf * ({_K1} + 1.0)
             / (tf.tf + {_K1} * (1.0 - {_B}
                                 + {_B} * dl.dl
                                   / (SELECT avgdl FROM stats)))
         ) AS s
  FROM tf
  JOIN qdf USING (term)
  JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {_K}"""


RETRIEVAL_QUERIES = {
    "bm25_topk": (q_bm25_topk, sql_bm25_topk),
}
