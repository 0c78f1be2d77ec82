"""Measured-scaling probe for SCALE.md: run the heaviest queries (and the
shared legs they amortize) at two scale factors, recording wall seconds
and shuffle read/write bytes per query from the Spark REST status API.

Usage:
  python scripts/scale_probe.py <sf_dir> [query ...]

Prints one JSON line per query: {"name", "wall_sec", "shuffle_read_mb",
"shuffle_write_mb"} plus a "_shared_legs" entry. Shuffle bytes come from
diffing the completed-stage totals around each query, so concurrent jobs
would pollute them - run alone.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.session import (
    get_spark,
)

DEFAULT_QUERIES = [
    # round-7's five most expensive + graph battery + PQ/ANN family
    "q_item_cooccurrence", "q_median_mad", "q_bootstrap_ci",
    "q_referential_audit", "q_dedup_clusters", "q_triangle_count",
    "q_clustering_coef", "q_ivfpq_topk", "q_pq_recall", "q_semdedup",
    # round-9 scale-shape changes: fixed-budget probes, two-phase rank
    "q_knn_eval", "q_percentiles",
]


def shuffle_totals(ui: str) -> tuple[int, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    # the engine session disables the UI; the probe needs its REST API
    spark = get_spark(
        app_name="scale-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if ui is None:
        raise SystemExit("Spark UI unavailable; cannot read shuffle metrics")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm up on whatever table the (possibly partial) fixture has —
    # embeddings-only builds have no orders.parquet
    import glob as _glob

    warm = sorted(_glob.glob(os.path.join(sf_dir, "*.parquet")))
    if warm:
        force(spark.read.parquet(warm[0]).limit(5000))

    def probe(name, fn):
        r0, w0 = shuffle_totals(ui)
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        r1, w1 = shuffle_totals(ui)
        print(json.dumps({
            "name": name, "sf_dir": sf_dir, "wall_sec": round(wall, 2),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }), flush=True)

    # shared legs first (they amortize across the battery; their cost is
    # the corpus-sized leg the queries below consume warm), one line each.
    # SPARK_GRAFT_NO_SHARED=1 skips them (bench-consistent semantics:
    # each probed query then pays its own legs) — also the switch for
    # partial fixtures (e.g. the 1000× orders+lineitem build) where leg
    # inputs don't exist.
    if os.environ.get("SPARK_GRAFT_NO_SHARED", "") != "1":
        for leg, thunk in entrymod.shared_legs().items():
            probe(f"leg:{leg}", lambda t=thunk: t(spark, sf_dir))

    q = entrymod.queries()
    for name in names:
        probe(name, lambda n=name: force(q[n](spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
