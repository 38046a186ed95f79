"""Supplementary measurement harness (guide §1.4): noop-sink isolation and
driver/executor time attribution for the headline queries, plus targeted
A/B micros used during the optimization round.  bench.py stays the frozen
driver contract; numbers from THIS file are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py attribute   # per-query build/plan/exec + stage time
  python bench_extra.py noop        # noop-sink wall per headline query
"""

from __future__ import annotations

import json
import os
import sys
import time


def _stage_totals(spark):
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return 0.0, 0.0
    run_ms = sum(s.get("executorRunTime", 0) for s in stages)
    cpu_ns = sum(s.get("executorCpuTime", 0) for s in stages)
    return run_ms / 1e3, cpu_ns / 1e9


def _session(cores: int):
    from mapbox_filter_spark.session import build_session

    return build_session(cores=cores, app_name=f"bench-extra-{cores}",
                         extra_conf={"spark.ui.enabled": "true",
                                     "spark.ui.port": "0",
                                     "spark.ui.retainedStages": "20000"})


def _jobs(spark, sf_dir):
    from bench import headline_queries
    from mapbox_filter_spark.plans.pipeline import run_filter_job_features
    from mapbox_filter_spark.queries import README_STYLE
    from mapbox_filter_spark.sources.features import features_from_lineitem

    jobs = dict(headline_queries())
    feats = features_from_lineitem(spark, sf_dir)

    def flagship(spark, sf_dir):
        return run_filter_job_features(feats, README_STYLE, zooms=[4, 6, 8])

    jobs["flagship_pipeline"] = flagship
    return jobs


def attribute(cores: int, sf_dir: str, rounds: int = 3) -> None:
    spark = _session(cores)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    jobs = _jobs(spark, sf_dir)
    out: dict = {}
    for _ in range(rounds):
        for name, fn in jobs.items():
            spark.sparkContext.setJobDescription(f"attr:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # force analysis+planning
            t2 = time.perf_counter()
            r0, c0 = _stage_totals(spark)
            n = df.count()
            t3 = time.perf_counter()
            r1, c1 = _stage_totals(spark)
            rec = out.setdefault(name, {"build": [], "plan": [], "exec": [],
                                        "run": [], "cpu": [], "rows": n})
            rec["build"].append(round(t1 - t0, 3))
            rec["plan"].append(round(t2 - t1, 3))
            rec["exec"].append(round(t3 - t2, 3))
            rec["run"].append(round(r1 - r0, 3))
            rec["cpu"].append(round(c1 - c0, 3))
    print(json.dumps(out, indent=1))
    spark.stop()


def noop(cores: int, sf_dir: str, rounds: int = 3) -> None:
    """Full-result computation (no aggregate pruning) via the noop sink."""
    spark = _session(cores)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    jobs = _jobs(spark, sf_dir)
    out: dict = {}
    for _ in range(rounds):
        for name, fn in jobs.items():
            spark.sparkContext.setJobDescription(f"noop:{name}")
            df = fn(spark, sf_dir)
            r0, c0 = _stage_totals(spark)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            r1, c1 = _stage_totals(spark)
            rec = out.setdefault(name, {"wall": [], "run": [], "cpu": []})
            rec["wall"].append(round(sec, 3))
            rec["run"].append(round(r1 - r0, 3))
            rec["cpu"].append(round(c1 - c0, 3))
    print(json.dumps(out, indent=1))
    spark.stop()


def sweep(cores: int, sf_dir: str, out_path: "str | None" = None) -> None:
    """Time EVERY registered gate once (noop sink, full-column computation)
    with per-gate executor run/cpu deltas — the round-6 whole-surface
    checklist measurement.  Ranking is the point: the slowest gates get the
    per-operator optimization attention; absolute numbers carry fixed
    per-query overhead (~0.1-0.3 s driver-side build at sf0.01)."""
    from mapbox_filter_spark import queries as q

    spark = _session(cores)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    reg = q.queries()
    out: dict = {}
    for name, fn in reg.items():
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            r0, c0 = _stage_totals(spark)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            r1, c1 = _stage_totals(spark)
            out[name] = {"build": round(t1 - t0, 3),
                         "exec": round(t2 - t1, 3),
                         "run": round(r1 - r0, 3),
                         "cpu": round(c1 - c0, 3)}
        except Exception as e:  # noqa: BLE001 — sweep must finish
            out[name] = {"error": str(e)[:160]}
        print(name, out[name], flush=True)
    ranked = sorted((v.get("exec", 0.0), k) for k, v in out.items())[::-1]
    print(json.dumps({"slowest": ranked[:25],
                      "total_exec": round(sum(v.get("exec", 0.0)
                                              for v in out.values()), 1),
                      "n": len(out)}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "attribute"
    if mode == "attribute":
        attribute(cores, sf_dir)
    elif mode == "noop":
        noop(cores, sf_dir)
    elif mode == "sweep":
        sweep(cores, sf_dir, sys.argv[2] if len(sys.argv) > 2 else None)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
