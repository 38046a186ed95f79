#!/usr/bin/env python
"""spark-submit entry point for the flagship tile job.

Cluster deployment (north rule: ``spark-submit --py-files`` on a
multi-executor cluster):

    python scripts/package.py                       # -> dist/mapbox_filter_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/mapbox_filter_spark.zip \
        scripts/submit_tile_job.py \
        --input /data/documents --output /data/tiles \
        --style style.json --zooms 4,6,8 --run-id corpus-v1

In the sandbox the same script runs under local[N] (spark-submit or plain
python) — the SparkSession comes from the environment, no master hardcoded.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet dir")
    p.add_argument("--output", required=True, help="tile store output dir")
    p.add_argument("--style", required=True, help="style JSON path")
    p.add_argument("--zooms", default="4,6,8")
    p.add_argument("--run-id", default="run-1",
                   help="input snapshot id (checkpoint key component)")
    p.add_argument("--no-checkpoint", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mfs-tile-job").getOrCreate()

    from mapbox_filter_spark.plans.manifest import (
        checkpointed_tile_job, style_run_key)
    from mapbox_filter_spark.plans.pipeline import run_filter_job
    from mapbox_filter_spark.plans.sink import write_tiles_parquet
    from mapbox_filter_spark.style.model import load_style

    with open(args.style) as f:
        style_json = json.load(f)
    style = load_style(style_json)
    zooms = [int(z) for z in args.zooms.split(",")]
    docs = spark.read.parquet(args.input)

    if args.no_checkpoint:
        tiles = run_filter_job(docs, style, zooms)
        write_tiles_parquet(tiles, args.output)
        print(json.dumps({"tiles": spark.read.parquet(args.output).count()}))
    else:
        key = style_run_key(style_json, args.run_id)
        manifest = checkpointed_tile_job(
            spark, docs, style, zooms, args.output, key)
        done = manifest.completed()
        failed = manifest.failed()
        print(json.dumps({
            "run_key": key,
            "partitions_done": len(done),
            "partitions_failed": sorted(failed),
            "tiles": sum(e.get("tiles", 0) for e in manifest.entries.values()
                         if e.get("status") == "done"),
        }))
        if failed:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
