#!/usr/bin/env python
"""Per-query isolation harness for optimization work (guide §1).

NOT the driver bench (bench.py is frozen); this times individual
headline queries with the noop sink, min-of-N repeats, and optionally
dumps .explain("formatted") to a directory.

    python bench_extra.py q1_pricing_summary docs_dedup_jaccard_pairs
    python bench_extra.py --all
    python bench_extra.py --plans plans/r07 --suffix _before docs_dedup_jaccard_pairs

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_pdftodocx_ocr_spark import job  # noqa: E402


def _headline():
    import bench
    return bench.HEADLINE


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None,
                    help="directory to write <query><suffix>.txt explain dumps")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--reps", type=int,
                    default=int(os.environ.get("BENCH_EXTRA_REPS", "3")))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # same tmpfs shuffle-dir tuning as bench.py
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = d
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    headline = _headline()
    names = list(headline) if args.all else args.names
    unknown = [n for n in names if n not in headline]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    from local_pdftodocx_ocr_spark.operators import dedup, similarity, textstats

    # Queries that bench.py times WARM (they reuse a memo built by an
    # earlier suite row); everything else is timed cold, so clear the
    # module memos before each rep to mirror the frozen bench.
    warm_consumers = {"docs_dedup_canonical_keep", "docs_dedup_cluster_sizes",
                      "emb_semdedup", "pipeline_training_corpus_full"}

    def _clear_memos():
        dedup.clear_unified_memo()
        similarity._PQ_CACHE.clear()
        similarity._IVFPQ_CACHE.clear()
        similarity._KMEANS_CACHE.clear()
        textstats._HH_CELLS_CACHE.clear()

    spark = job.build_session(cpus, app="bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm-up

    out: dict[str, dict] = {}
    for name in names:
        fn = headline[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"),
                      "w", encoding="utf-8") as f:
                f.write(plan)
            dedup.release_caches()
        walls = []
        for _ in range(args.reps):
            if name not in warm_consumers:
                _clear_memos()
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
            dedup.release_caches()
        if walls:
            out[name] = {"min": min(walls), "walls": walls}
            print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()},
                      "sf_dir": sf_dir, "cpus": cpus}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
