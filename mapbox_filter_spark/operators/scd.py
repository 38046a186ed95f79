"""SCD Type-2 dimension maintenance: fold attribute-change batches into a
versioned (valid_from, valid_to, is_current) dimension table.

A training-data lake keeps slowly-changing metadata — source quality
tiers, license states, crawl configs — and every derived dataset must be
joinable to the attributes AS OF its snapshot time (the other half of
``asof_join``).  SCD2 is the standard shape: one row per (key, version),
half-open validity ``[valid_from, valid_to)``, ``valid_to IS NULL`` on
the current row.

``scd2_upsert`` is ONE shuffle on the key: the open rows and the update
batch enter a keyed window ordered by effective time; consecutive
versions with unchanged attributes are dropped (no-op suppression via
``lag`` over an attribute struct), ``valid_to`` is the ``lead`` of
``valid_from``, and closed history rows pass through untouched.
Consequences of that design, by contract:

- a batch may carry MANY updates per key — they become consecutive
  versions in one pass (no per-update loop);
- updates are expected at-or-after the open row's ``valid_from``
  (append-only CDC).  A LATE update re-splices only among {open row,
  batch}: closed history is never rewritten.  Feed late corrections
  through a rebuild, not an upsert.
- the fold is associative under that contract: upsert(batch1) then
  upsert(batch2) equals upsert(batch1 ∪ batch2) when batch2's times are
  ≥ batch1's per key (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_upsert", "scd2_asof"]


def scd2_upsert(
    current: DataFrame | None,
    updates: DataFrame,
    *,
    key: list[str],
    attrs: list[str],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Fold an update batch into an SCD2 table.

    ``current`` columns: key + attrs + valid_from + valid_to +
    is_current (pass ``None`` to build a dimension from scratch);
    ``updates`` columns: key + attrs + ``ts`` (effective time).
    Returns the new full SCD2 table.  Ties on (key, ts) resolve by
    ``tiebreak`` (last wins); pass it when one batch can carry two
    updates at one timestamp.
    """
    extra = [tiebreak] if tiebreak is not None else []
    upd = updates.select(
        *key, *attrs,
        F.col(ts).alias("valid_from"),
        F.lit(0).alias("_src"),
        *[F.col(t) for t in extra])
    if current is not None:
        closed = current.filter(~F.col("is_current"))
        open_rows = (current.filter(F.col("is_current"))
                     .select(*key, *attrs, "valid_from",
                             F.lit(1).alias("_src"),
                             # open rows have no tiebreak; NULL sorts
                             # first, matching their _src priority
                             *[F.lit(None)
                               .cast(updates.schema[t].dataType)
                               .alias(t) for t in extra]))
        cand = open_rows.unionByName(upd)
    else:
        closed = None
        cand = upd

    order = [F.col("valid_from").asc(), F.col("_src").desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*key).orderBy(*order)
    sig = F.struct(*[F.col(a) for a in attrs])
    # null-safe comparison: plain != yields NULL when an attribute is
    # NULL on either side, which would silently DROP a real change
    # to/from NULL.  A NULL _prev_sig only occurs for the first version
    # (lag of the struct itself is NULL only at the partition head —
    # sig is never NULL, being a struct of columns).
    dedup = (cand
             .withColumn("_prev_sig", F.lag(sig).over(w))
             .filter(F.col("_prev_sig").isNull()
                     | ~(F.col("_prev_sig").eqNullSafe(sig))))
    w2 = Window.partitionBy(*key).orderBy(*order)
    versioned = (dedup
                 .withColumn("valid_to", F.lead("valid_from").over(w2))
                 .withColumn("is_current", F.col("valid_to").isNull())
                 .select(*key, *attrs, "valid_from", "valid_to",
                         "is_current"))
    if closed is not None:
        versioned = closed.select(*key, *attrs, "valid_from", "valid_to",
                                  "is_current").unionByName(versioned)
    return versioned


def scd2_asof(dim: DataFrame, at) -> DataFrame:
    """Snapshot the dimension as of a timestamp column/literal:
    ``valid_from <= at < valid_to`` (open rows match any later time)."""
    at_c = F.lit(at) if not hasattr(at, "_jc") else at
    return dim.filter((F.col("valid_from") <= at_c)
                      & (F.col("valid_to").isNull()
                         | (F.col("valid_to") > at_c)))


def cdc_apply(base: DataFrame, changes: DataFrame, *, key: str,
              val_cols: "list[str]", seq: str = "seq",
              op: str = "op") -> DataFrame:
    """Apply an ordered change log (op ∈ I/U/D with a total-order
    ``seq``) onto a base snapshot — the MERGE/upsert compaction every
    CDC-fed lakehouse table needs.  Last-writer-wins per key; a final
    D deletes the key.

    Shape: base rows enter as seq = −1 inserts, then ONE window
    (row_number DESC over (seq)) picks each key's final image — no
    join at all, one shuffle on the key.  Ties in ``seq`` within a key
    are refused in-plan (raise_error): a CDC log without a total order
    per key has no deterministic answer, and silently picking one is
    how replicas diverge.

    Returns the final state ``(key, *val_cols, last_seq, n_ops)``
    where n_ops counts applied log entries (0 = untouched base row).
    """
    from pyspark.sql import Window

    b = base.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"_v_{c}") for c in val_cols],
        F.lit(-1).cast("long").alias("_seq"),
        F.lit("I").alias("_op"))
    sq = F.col(seq).cast("long")
    c = changes.select(
        F.col(key).alias("_k"),
        *[F.col(v).alias(f"_v_{v}") for v in val_cols],
        F.when(sq < 0, F.raise_error(F.lit(
            "cdc_apply: change seq must be >= 0 (base reserves -1)"))
            .cast("long")).otherwise(sq).alias("_seq"),
        F.col(op).alias("_op"))
    allr = b.unionByName(c)
    w = Window.partitionBy("_k").orderBy(F.col("_seq").desc())
    dup = F.count(F.lit(1)).over(
        Window.partitionBy("_k", "_seq"))
    ranked = allr.select(
        "*", F.row_number().over(w).alias("_rn"),
        F.when(dup > 1, F.raise_error(F.concat(
            F.lit("cdc_apply: duplicate seq for key "),
            F.col("_k").cast("string"))).cast("long"))
        .otherwise(F.lit(0)).alias("_dupchk"),
        F.sum(F.when(F.col("_seq") >= 0, 1).otherwise(0)).over(
            Window.partitionBy("_k")).alias("n_ops"))
    return (ranked.filter((F.col("_rn") == 1) & (F.col("_op") != "D")
                          & (F.col("_dupchk") == 0))
            .select(F.col("_k").alias(key),
                    *[F.col(f"_v_{c2}").alias(c2) for c2 in val_cols],
                    F.col("_seq").alias("last_seq"), "n_ops"))
