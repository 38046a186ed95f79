"""Benchmark harness.

Default: run the headline suite at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput": {...}}

--scaling: run the flagship job at two parallelism levels (local[8] vs
local[32] by default) in separate spawned processes (a JVM's master can't be
changed in-process) and report throughput at both + scaling efficiency
(the sandbox stand-in for N->4N executors; BASELINE.md).  Results are also
appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def headline_queries():
    from mapbox_filter_spark import queries as q

    names = [
        "tile_assign", "style_filter_readme", "zoom_gates", "tile_assembly",
        "window_renumber", "hash_diff",
    ]
    reg = q.queries()
    return {n: reg[n] for n in names if n in reg}


def run_suite(cores: int, sf_dir: str) -> dict:
    from mapbox_filter_spark.session import build_session
    from mapbox_filter_spark.plans.pipeline import run_filter_job_features
    from mapbox_filter_spark.queries import README_STYLE
    from mapbox_filter_spark.sources.features import features_from_lineitem

    spark = build_session(cores=cores, app_name=f"bench-{cores}")
    timings: dict[str, float] = {}
    flagship_only = os.environ.get("SPARK_GRAFT_BENCH_FLAGSHIP_ONLY") == "1"

    # warm the JVM + parquet footer cache once
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    if not flagship_only:
        for name, fn in headline_queries().items():
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)

    # flagship pipeline throughput: features/sec through σ->π->γ and
    # tiles/sec.  Scaling-measurement hygiene:
    # - the scan must outweigh fixed overheads: replicate the feature set 8x
    #   (distinct ids) over a FIXED 64 input partitions — partitioning is
    #   data-proportional, not core-proportional, so every parallelism level
    #   runs identical physical work;
    # - materialize the substrate to parquet (a cache can silently evict and
    #   re-run the expensive explode+repartition mid-measurement);
    # - warm-up run, then min of N repetitions (the sandbox VM has noisy-
    #   neighbor variance; min is the standard noise-robust estimator).
    from pyspark.sql import functions as F

    rep_factor = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "8"))
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    subst = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"bench_feats_{sf_dir.replace('/', '_')}_x{rep_factor}")
    if not os.path.exists(os.path.join(subst, "_SUCCESS")):
        (
            features_from_lineitem(spark, sf_dir)
            .withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(rep_factor)])))
            .withColumn("feature_id", F.col("feature_id") * rep_factor + F.col("rep"))
            .drop("rep")
            .repartition(64)
            .write.mode("overwrite").parquet(subst)
        )
    feats = spark.read.parquet(subst)
    n_features = feats.count()
    run_filter_job_features(feats, README_STYLE, zooms=[3]).count()  # warm
    reps = []
    n_tiles = 0
    for _ in range(n_reps):
        t0 = time.perf_counter()
        tiles = run_filter_job_features(feats, README_STYLE, zooms=[4, 6, 8])
        n_tiles = tiles.count()
        reps.append(time.perf_counter() - t0)
    flagship_sec = min(reps)
    timings["flagship_pipeline"] = round(flagship_sec, 3)

    spark.stop()
    return {
        "flagship_reps": [round(r, 3) for r in reps],
        "timings": timings,
        "n_features": n_features,
        "n_tiles": n_tiles,
        "flagship_sec": flagship_sec,
        "tiles_per_sec": round(n_tiles / flagship_sec, 1),
        "features_per_sec": round(n_features * 3 / flagship_sec, 1),  # 3 zooms
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if "--scaling" in sys.argv:
        # Noise protocol for the N->4N evidence (sandbox VM has time-varying
        # neighbor load): a LARGE substrate (32x replication: job is tens of
        # seconds at 8 cores, so parallelism — not task overhead — is what's
        # measured), ALTERNATING 8/32 rounds so slow host phases hit both
        # levels, best-throughput-per-level across rounds.
        rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "2"))
        env = {
            **os.environ,
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_BENCH_REP": os.environ.get("SPARK_GRAFT_BENCH_REP", "32"),
            "SPARK_GRAFT_BENCH_REPEATS": "2",
            "SPARK_GRAFT_BENCH_FLAGSHIP_ONLY": "1",
        }
        best: dict[int, dict] = {}
        for _ in range(rounds):
            for c in (8, 32):
                out = subprocess.run(
                    [sys.executable, __file__, "--single", str(c)],
                    capture_output=True, text=True, env=env, check=True)
                r = json.loads(out.stdout.strip().splitlines()[-1])
                cur = r["throughput"]["tiles_per_sec"]
                if c not in best or cur > best[c]["throughput"]["tiles_per_sec"]:
                    best[c] = r
        t8 = best[8]["throughput"]["tiles_per_sec"]
        t32 = best[32]["throughput"]["tiles_per_sec"]
        eff = round((t32 / t8) / 4.0, 3)
        report = {
            "tiles_per_sec_8": t8, "tiles_per_sec_32": t32,
            "features_per_sec_8": best[8]["throughput"]["features_per_sec"],
            "features_per_sec_32": best[32]["throughput"]["features_per_sec"],
            "flagship_sec_8": best[8]["flagship_sec"],
            "flagship_sec_32": best[32]["flagship_sec"],
            "n_features": best[8]["n_features"],
            "scaling_efficiency": eff, "sf": sf,
        }
        print(json.dumps(report))
        _append_baseline(report, best)
        return

    if "--single" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--single") + 1])

    r = run_suite(cores, sf_dir)
    total = round(sum(r["timings"].values()), 3)
    print(json.dumps({
        "metric": "headline suite wall time (style-filter + tiling ops)",
        "value": total,
        "unit": "sec",
        "queries": r["timings"],
        "sf": float(sf),
        "cores": cores,
        "throughput": {
            "tiles_per_sec": r["tiles_per_sec"],
            "features_per_sec": r["features_per_sec"],
            "n_tiles": r["n_tiles"],
            "n_features": r["n_features"],
        },
    }))


def _append_baseline(report: dict, results: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run sf={report['sf']} "
            f"({report.get('n_features', '?')} features x 3 zooms, best-of-rounds)\n\n"
            f"| cores | flagship wall (s) | tiles/sec | filtered-features/sec |\n"
            f"|---|---|---|---|\n"
            f"| 8 | {report.get('flagship_sec_8', '?'):.2f} | "
            f"{report['tiles_per_sec_8']} | {report['features_per_sec_8']} |\n"
            f"| 32 | {report.get('flagship_sec_32', '?'):.2f} | "
            f"{report['tiles_per_sec_32']} | {report['features_per_sec_32']} |\n\n"
            f"scaling efficiency (T32/T8)/4 = **{report['scaling_efficiency']}** "
            f"(target >= 0.8 per BASELINE.json; sandbox stand-in for N->4N "
            f"executors per driver instruction)\n"
        )


if __name__ == "__main__":
    main()
