"""Dump .explain('formatted') for named declared queries to files.

Usage: python scripts/explain_dump.py <outdir> <suffix> q_a q_b ...
Writes <outdir>/<query>_<suffix>.txt for each query. The judge cannot run
Spark, so these files are the committed evidence for every plan claim in
OPTIMIZATION_r*.md (optimization guide §7.2).

For streaming-runtime queries the interesting evidence is the drain
telemetry (state-store instance count, commit ms), not the post-drain
batch plan — when DRAIN_TELEMETRY is non-empty after building the frame,
it is appended to the dump.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark import (
    streaming as _streaming,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.session import (
    get_spark,
)


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        _streaming.DRAIN_TELEMETRY.clear()
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
            if _streaming.DRAIN_TELEMETRY:
                fh.write("\n-- drain telemetry (streaming runtime legs) --\n")
                for k, v in _streaming.DRAIN_TELEMETRY.items():
                    fh.write(f"{k}: {v}\n")
        print(f"wrote {path}")
        entrymod.release_transient_checkpoints(spark)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
