"""mapbox_filter_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the capabilities of ondrap/mapbox-filter
(reference: /root/reference, Haskell) as an idiomatic Spark engine:

- Mapbox GL style filter expressions compile to native ``pyspark.sql.Column``
  trees (Catalyst-optimized, whole-stage-codegen; zero Python in the hot path)
  with the reference's *failure-monad* semantics (NULL == failure, null-strict
  ``all``/``any``, top-level ``coalesce(pred, False)``).
- Tile pyramid math (Web-Mercator ZXY, quadkey cells, TMS flip, polyfill,
  k-ring) as pure Column expressions / numpy kernels.
- Relational dataflow: explode interleaved documents -> feature rows ->
  filter -> metadata prune -> tile assembly (span order preserved) ->
  down-copy join -> hash-diff incremental -> partitioned parquet sink with a
  per-partition lineage manifest for checkpoint/resume.
- Scale path: broadcast + salted skew joins, ring-expansion kNN,
  MinHash/SimHash dedup, ANN similarity, text analysis.
"""

__version__ = "0.1.0"
