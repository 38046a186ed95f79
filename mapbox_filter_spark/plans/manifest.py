"""Checkpoint/resume manifest: per-partition commits with lineage + metrics.

Parity target: the reference's job/checkpoint SQLite tables
(/root/reference/app/DbAccess.hs:165-188: job table built by a group-by
scan, rows deleted as columns complete, keyed by db+style mtime via
makeModtimeStr /root/reference/app/Main.hs:510-515) and its error-quarantine
retry (app/DbAccess.hs:133-142, retried first app/Main.hs:347-354).

Engine shape ("Iceberg emulation" — partitioned parquet + JSON snapshot
manifest, documented in SURVEY.md §7):

- output table: ``<out>/part_id=N/`` parquet directories (one per input
  partition; dynamic-overwrite per partition = Iceberg replaceWhere).
- manifest: ``<out>/_manifest/<run_key>.json`` — append-only record of
  {partition, rows, tiles, wall_sec, status}; a partition present with
  status=done is NEVER recomputed on resume.
- run_key: caller-supplied identity of (input snapshot, style) — a changed
  style or input forces a fresh manifest == full recompute, exactly the
  reference's mtime-keyed job file (README.md:103-108).
- failed partitions are recorded and RETRIED FIRST on the next run.

Scale: the driver loop commits one *input partition* at a time (64-ish
partitions of a 10^12-row table; each partition is itself a full Spark job
over ~10^10 rows).  Metrics come from ``df.observe`` — no extra pass.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class Manifest:
    path: str
    run_key: str
    entries: dict[str, dict] = field(default_factory=dict)

    @classmethod
    def load(cls, out_dir: str, run_key: str) -> "Manifest":
        path = os.path.join(out_dir, "_manifest", f"{run_key}.json")
        m = cls(path, run_key)
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            assert data.get("run_key") == run_key
            m.entries = data.get("partitions", {})
        return m

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"run_key": self.run_key, "partitions": self.entries}, f,
                      indent=1)
        os.replace(tmp, self.path)  # atomic commit, crash-safe

    def completed(self) -> set[str]:
        return {p for p, e in self.entries.items() if e.get("status") == "done"}

    def failed(self) -> set[str]:
        return {p for p, e in self.entries.items() if e.get("status") == "failed"}

    def record(self, part: str, **fields) -> None:
        self.entries[str(part)] = {**self.entries.get(str(part), {}), **fields}
        self.save()


def run_partitioned_job(
    spark,
    partitions: Sequence[int],
    build_partition: Callable[[int], DataFrame],
    out_dir: str,
    run_key: str,
    partition_col: str = "part_id",
    fail_injector: Optional[Callable[[int], None]] = None,
) -> Manifest:
    """Execute ``build_partition(part)`` per pending partition, writing each
    to ``<out>/part_id=N`` and committing the manifest entry afterwards.

    Resume: completed partitions are skipped; failed ones run FIRST.
    ``fail_injector`` exists for kill/resume tests.
    """
    manifest = Manifest.load(out_dir, run_key)
    done = manifest.completed()
    # reference ordering: retry errors first, then ascending scan order
    order = sorted(manifest.failed() & {str(p) for p in partitions},
                   key=lambda s: int(s))
    order += [str(p) for p in sorted(partitions) if str(p) not in done
              and str(p) not in order]

    for part_s in order:
        part = int(part_s)
        t0 = time.perf_counter()
        try:
            if fail_injector is not None:
                fail_injector(part)
            obs = Observation(f"part-{part}")
            df = build_partition(part).observe(
                obs, F.count(F.lit(1)).alias("tiles"),
                F.sum("feature_count").alias("rows"))
            target = os.path.join(out_dir, f"{partition_col}={part}")
            df.write.mode("overwrite").parquet(target)
            got = obs.get
            manifest.record(
                part, status="done",
                tiles=int(got.get("tiles") or 0),
                rows=int(got.get("rows") or 0),
                wall_sec=round(time.perf_counter() - t0, 3),
            )
        except Exception as err:  # quarantine + continue (DbAccess.hs:133-142)
            manifest.record(part, status="failed", error=str(err)[:500],
                            wall_sec=round(time.perf_counter() - t0, 3))
    return manifest


def checkpointed_tile_job(
    spark,
    documents: DataFrame,
    style,
    zooms: Sequence[int],
    out_dir: str,
    run_key: str,
    n_parts: Optional[int] = None,
    fail_injector: Optional[Callable[[int], None]] = None,
) -> Manifest:
    """The flagship job under checkpoint/resume: one commit per input
    ``part_id`` partition."""
    from .pipeline import run_filter_job

    if n_parts is None:
        parts = [r["part_id"] for r in
                 documents.select("part_id").distinct().collect()]
    else:
        parts = list(range(n_parts))

    def build(part: int) -> DataFrame:
        return run_filter_job(
            documents.filter(F.col("part_id") == part), style, zooms)

    return run_partitioned_job(spark, parts, build, out_dir, run_key,
                               fail_injector=fail_injector)


def style_run_key(style_json: dict | str, input_id: str) -> str:
    """Run identity = hash(style, input snapshot) — makeModtimeStr parity."""
    import hashlib

    blob = json.dumps(style_json, sort_keys=True) if not isinstance(
        style_json, str) else style_json
    return hashlib.sha256(f"{input_id}|{blob}".encode()).hexdigest()[:16]
