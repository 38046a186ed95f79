"""Gate queries for the n-gram LM statistics block (operators/lm.py)
over the ``documents`` table.

The oracle rebuilds the gram instances with DuckDB list slicing over the
SAME normalized word arrays (the shared ``_WORDS_SQL`` fragment), so a
value-hash match proves tokenization, gram windowing, and the integer
count arithmetic agree instance-for-instance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.lm import conditional_counts, continuation_counts
from .queries_curation import _WORDS_SQL

_N = 3  # trigram model


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_GRAMS_SQL = f"""grams AS (
  SELECT array_to_string(words[(t.i + 1):(t.i + {_N - 1})], ' ') AS context,
         words[t.i + {_N}] AS token
  FROM base, LATERAL (
    SELECT unnest(range(LEN(words) - {_N - 1})) AS i) t
  WHERE LEN(words) >= {_N}
)"""


def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional trigram table: exact integer (cnt, ctx_cnt) pairs."""
    return conditional_counts(_docs(spark, sf_dir), "text", n=_N)


def sql_ngram_lm() -> str:
    return f"""
WITH {_WORDS_SQL},
{_GRAMS_SQL}
SELECT context, token, COUNT(*) AS cnt,
       CAST(SUM(COUNT(*)) OVER (PARTITION BY context) AS BIGINT) AS ctx_cnt
FROM grams
GROUP BY context, token"""


def q_kn_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation counts: distinct contexts per token."""
    return continuation_counts(_docs(spark, sf_dir), "text", n=_N)


def sql_kn_continuation() -> str:
    return f"""
WITH {_WORDS_SQL},
{_GRAMS_SQL}
SELECT token, COUNT(DISTINCT context) AS n_contexts
FROM grams
GROUP BY token"""


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-0 BPE statistic: corpus-wide adjacent character pair counts
    (operators/bpe.py char_pair_counts)."""
    from .operators.bpe import char_pair_counts

    return char_pair_counts(_docs(spark, sf_dir), "text")


def sql_bpe_pair_counts() -> str:
    return f"""
WITH {_WORDS_SQL},
w AS (SELECT unnest(words) AS w FROM base),
pairs AS (
  SELECT substr(w, CAST(t.i + 1 AS INT), 1) AS sym_a,
         substr(w, CAST(t.i + 2 AS INT), 1) AS sym_b
  FROM w, LATERAL (SELECT unnest(range(LEN(w) - 1)) AS i) t
)
SELECT sym_a, sym_b, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2"""


LM_QUERIES = {
    "ngram_lm": (q_ngram_lm, sql_ngram_lm),
    "kn_continuation": (q_kn_continuation, sql_kn_continuation),
    "bpe_pair_counts": (q_bpe_pair_counts, sql_bpe_pair_counts),
}
