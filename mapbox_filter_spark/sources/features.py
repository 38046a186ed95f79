"""Feature rows derived deterministically from the driver's TPC-H-ish
testdata (TESTDATA.md) — the shared substrate for the DuckDB-oracle
correctness gate.

The SAME arithmetic is expressed twice: once as Spark Columns
(``features_from_lineitem``) and once as ANSI SQL (``FEATURES_ORACLE_SQL``,
a CTE the oracle queries prepend), so every engine operator can be checked
value-for-value against DuckDB on identical inputs.

All key-derived modulars are over positive ints, where Spark ``pmod`` and
DuckDB ``%`` agree exactly; lon/lat use integer modular arithmetic scaled by
1000, exact in doubles.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LAYERS = ("waterway", "landuse", "place", "transportation")
_CLASSES = ("river", "stream", "lake", "canal", "drain")
_BRUNNEL = ("tunnel", "bridge", "ford")
_GEOMS = ("Point", "LineString", "Polygon")

# bump when the derivation arithmetic changes — keys the parquet cache
# (v2: cache written range-clustered on (layer, geom_kind) so pushed layer
# predicates prune parquet row groups — see OPTIMIZATION_r06.md)
_FEATURES_VERSION = "v2"

# Per-(application, cache-path) memo of the RESOLVED base relation.  This
# caches no data and no results — only the lazy DataFrame handle — so every
# action still scans parquet; it exists because each `spark.read.parquet`
# call re-lists the directory and re-infers the schema (a driver-side job),
# which the r6 attribution measured at ~0.1 s per query build.  Keyed by
# applicationId so a new session (or a rebuilt cache path, which changes the
# fingerprint and hence the path) never sees a stale relation.
_RELATION_MEMO: dict = {}


def _read_cached_relation(spark: SparkSession, path: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, path)
    df = _RELATION_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if len(_RELATION_MEMO) > 64:  # bound growth across many sf_dirs
            _RELATION_MEMO.clear()
        _RELATION_MEMO[key] = df
    return df


def _source_fingerprint(sf_dir: str) -> str:
    """Stable hex digest of the lineitem source identity: (relative path,
    size, mtime_ns) of every file under lineitem.parquet (or the single
    file itself).  Cheap — stat only, no reads."""
    src = os.path.join(sf_dir, "lineitem.parquet")
    entries = []
    if os.path.isdir(src):
        for root, _dirs, files in os.walk(src):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append((os.path.relpath(p, src), st.st_size,
                                st.st_mtime_ns))
    elif os.path.exists(src):
        st = os.stat(src)
        entries.append(("lineitem.parquet", st.st_size, st.st_mtime_ns))
    import hashlib
    return hashlib.sha1(repr(sorted(entries)).encode()).hexdigest()[:12]


def features_from_lineitem(spark: SparkSession, sf_dir: str,
                           use_cache: "bool | None" = None) -> DataFrame:
    """Feature substrate — materialized once per sf_dir to parquet.

    The derivation-from-lineitem is a synthetic-data artifact; production
    reads features (props included) as parquet ATTRIBUTES.  Materializing
    the derivation once and scanning it gives every consumer the
    production plan shape — filters push to the scan, props are one cheap
    map read — instead of re-deriving 5 struct builders per row per
    query.  The parquet roundtrip is value-lossless (ints, strings,
    map<string,string>, and doubles are binary-exact), so the DuckDB
    oracle (which always derives from lineitem, FEATURES_ORACLE_SQL)
    still matches hash-for-hash.  Disable with use_cache=False /
    SPARK_GRAFT_FEATURE_CACHE=0 (e.g. to benchmark the derivation
    itself)."""
    if use_cache is None:
        use_cache = os.environ.get("SPARK_GRAFT_FEATURE_CACHE", "1") != "0"
    if not use_cache:
        return _derive_features(spark, sf_dir)

    slug = sf_dir.strip("/").replace("/", "_")
    # The cache key folds in a fingerprint of the SOURCE data (mtime+size of
    # every lineitem parquet part) so regenerating lineitem.parquet in the
    # same sf_dir (new seed / scale) invalidates the cache instead of
    # silently serving stale features (round-3 ADVICE).  The tempdir cache is
    # a LOCAL-MODE convenience only: on a real cluster the substrate is a
    # managed table and this path is bypassed (use_cache=False) — documented
    # in SCALE.md.
    cache = os.path.join(
        tempfile.gettempdir(),
        f"mfs_feats_{_FEATURES_VERSION}_{slug}_{_source_fingerprint(sf_dir)}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        tmp = f"{cache}.tmp.{os.getpid()}"
        try:
            # Range-cluster on (layer, geom_kind, feature_id): 32 files for
            # scan parallelism, each covering one (layer, geom_kind) slice,
            # so the pushable `layer IN (...)` predicates the style σ emits
            # (style_ops.filter_keep) skip whole row groups via parquet
            # min/max stats instead of decoding every row (guide §6: sort
            # order on write determines how well readers skip).  Content is
            # unchanged — every gate is partitioning/order-independent.
            (_derive_features(spark, sf_dir)
             .repartitionByRange(32, "layer", "geom_kind", "feature_id")
             .sortWithinPartitions("layer", "geom_kind")
             .write.mode("overwrite").parquet(tmp))
            os.rename(tmp, cache)  # atomic publish; loser keeps winner's
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(cache, "_SUCCESS")):
                return _derive_features(spark, sf_dir)
    return _read_cached_relation(spark, cache)


def _derive_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")

    def pick(arr, h):
        return F.element_at(F.array(*[F.lit(a) for a in arr]),
                            (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))

    cls = F.when(F.pmod(F.col("l_partkey"), F.lit(11)) != 0,
                 pick(_CLASSES, F.col("l_partkey")))
    brunnel = F.when(F.pmod(fid, F.lit(7)) != 0,
                     pick(_BRUNNEL, F.col("l_partkey") + F.col("l_suppkey")))
    rank = F.when(F.pmod(fid, F.lit(13)) != 0,
                  F.pmod(F.col("l_suppkey"), F.lit(9)).cast("string"))
    intermittent = F.when(
        F.pmod(fid, F.lit(17)) != 0,
        F.when(F.pmod(F.col("l_partkey"), F.lit(2)) == 0, "true").otherwise("false"),
    )

    entries = F.array(
        F.struct(F.lit("class").alias("key"), cls.alias("value")),
        F.struct(F.lit("brunnel").alias("key"), brunnel.alias("value")),
        F.struct(F.lit("rank").alias("key"), rank.alias("value")),
        F.struct(F.lit("intermittent").alias("key"), intermittent.alias("value")),
    )

    return li.select(
        F.concat(F.lit("doc-"), F.col("l_orderkey").cast("string")).alias("doc_id"),
        fid.alias("feature_id"),
        pick(_LAYERS, F.col("l_orderkey")).alias("layer"),
        pick(_GEOMS, F.col("l_suppkey")).alias("geom_kind"),
        ((F.pmod(fid * 7919, F.lit(360000)).cast("double") / 1000.0) - 180.0).alias("lon"),
        ((F.pmod(fid * 104729, F.lit(170000)).cast("double") / 1000.0) - 85.0).alias("lat"),
        F.map_from_entries(
            F.filter(entries, lambda e: e["value"].isNotNull())).alias("props"),
        # flat mirrors for oracle-side logic
        cls.alias("p_class"),
        brunnel.alias("p_brunnel"),
        rank.alias("p_rank"),
        intermittent.alias("p_intermittent"),
    )


def _sql_pick(arr, h_expr: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(arr)
    )
    return f"(CASE ({h_expr}) % {len(arr)} {whens} END)"


FEATURES_ORACLE_SQL = f"""
features AS (
  SELECT
    'doc-' || CAST(l_orderkey AS VARCHAR)                              AS doc_id,
    (l_orderkey * 10 + l_linenumber)                                   AS feature_id,
    {_sql_pick(_LAYERS, "l_orderkey")}                                 AS layer,
    {_sql_pick(_GEOMS, "l_suppkey")}                                   AS geom_kind,
    (((l_orderkey * 10 + l_linenumber) * 7919) % 360000) / 1000.0 - 180.0  AS lon,
    (((l_orderkey * 10 + l_linenumber) * 104729) % 170000) / 1000.0 - 85.0 AS lat,
    CASE WHEN l_partkey % 11 <> 0
         THEN {_sql_pick(_CLASSES, "l_partkey")} END                   AS p_class,
    CASE WHEN (l_orderkey * 10 + l_linenumber) % 7 <> 0
         THEN {_sql_pick(_BRUNNEL, "l_partkey + l_suppkey")} END       AS p_brunnel,
    CASE WHEN (l_orderkey * 10 + l_linenumber) % 13 <> 0
         THEN CAST(l_suppkey % 9 AS VARCHAR) END                       AS p_rank,
    CASE WHEN (l_orderkey * 10 + l_linenumber) % 17 <> 0
         THEN (CASE WHEN l_partkey % 2 = 0 THEN 'true' ELSE 'false' END) END
                                                                       AS p_intermittent
  FROM lineitem
)
"""
