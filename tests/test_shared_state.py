"""Cross-query shared-state contract (ADVICE round 7): central `_shared`
gate honors the SPARK_GRAFT_NO_SHARED bypass and the trace hook; session
rotation evicts dead-session caches; package shipping never pre-commits
its shipped marker on failure."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sources import (
    parquet as pq,
)


def test_shared_gate_memoizes_and_traces(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_SHARED", raising=False)
    monkeypatch.setattr(entry, "_SHARED_TRACE", [])
    memo: dict = {}
    calls = []
    out1 = entry._shared(memo, ("k",), "leg", lambda: calls.append(1) or 41)
    out2 = entry._shared(memo, ("k",), "leg", lambda: calls.append(1) or 42)
    assert out1 == out2 == 41  # second lookup is a hit, compute ran once
    assert calls == [1]
    assert entry._SHARED_TRACE == [("leg", "compute"), ("leg", "hit")]


def test_shared_gate_bypass_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_SHARED", "1")
    memo: dict = {}
    calls = []
    entry._shared(memo, ("k",), "leg", lambda: calls.append(1) or 1)
    entry._shared(memo, ("k",), "leg", lambda: calls.append(1) or 2)
    assert calls == [1, 1]  # recomputed every time
    assert memo == {}  # and nothing memoized


def test_session_scope_evicts_dead_session_entries(monkeypatch):
    class _SC:
        applicationId = "app-NEW"

    class _Spark:
        sparkContext = _SC()

    monkeypatch.setattr(entry, "_LIVE_TAG", "app-OLD")
    monkeypatch.setattr(
        entry, "_PAIRS_SHARED", {("app-OLD", "/d", "x"): object()}
    )
    monkeypatch.setattr(entry, "_SWEPT", {("app-OLD", "tt")})
    entry._TRAINED_STATE_MEMO[("app-OLD", "/d", "schema_evo")] = "/tmp/x"
    entry._TRAINED_STATE_MEMO[("/d", "cells_k")] = 7  # sf-keyed: kept
    tag = entry._session_scope(_Spark())
    assert tag == "app-NEW"
    assert entry._PAIRS_SHARED == {}
    assert entry._SWEPT == set()
    assert ("app-OLD", "/d", "schema_evo") not in entry._TRAINED_STATE_MEMO
    assert entry._TRAINED_STATE_MEMO[("/d", "cells_k")] == 7
    del entry._TRAINED_STATE_MEMO[("/d", "cells_k")]


def test_shared_legs_enumerates_callables():
    legs = entry.shared_legs()
    assert set(legs) >= {
        "neardup_pairs",
        "minhash_sigs",
        "dedup_survivors",
        "token_counts",
        "kmeans_assign_k8",
        "pq_codebooks",
        "bpe_rules",
        "schema_evo_stage",
    }
    assert all(callable(v) for v in legs.values())


def test_ship_package_retries_after_failure(monkeypatch):
    """A transient addPyFile failure must NOT permanently mark the session
    as shipped (ADVICE round 7, low): the next call retries."""
    attempts = []

    class _SC:
        applicationId = "app-ship-test"

        def addPyFile(self, p):
            attempts.append(p)
            if len(attempts) <= 2:  # first call: both files fail
                raise RuntimeError("transient filesystem error")

    class _Spark:
        sparkContext = _SC()

    monkeypatch.setattr(pq, "_SHIPPED", {})
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pq._ship_package(_Spark())
    assert "app-ship-test" not in pq._SHIPPED  # failure → not marked
    n_first = len(attempts)
    pq._ship_package(_Spark())  # retries and succeeds
    assert len(attempts) > n_first
    assert "app-ship-test" in pq._SHIPPED
    pq._ship_package(_Spark())  # now a no-op
    assert len(attempts) == n_first + 2


def test_ship_package_already_added_counts_as_shipped(monkeypatch):
    attempts = []

    class _SC:
        applicationId = "app-ship-dup"

        def addPyFile(self, p):
            attempts.append(p)
            raise RuntimeError("File with the same name already exists")

    class _Spark:
        sparkContext = _SC()

    monkeypatch.setattr(pq, "_SHIPPED", {})
    pq._ship_package(_Spark())
    assert "app-ship-dup" in pq._SHIPPED  # benign duplicate → shipped


def test_ship_package_eviction_is_fifo_never_the_newest(monkeypatch):
    """Bounding _SHIPPED must evict the OLDEST marker: arbitrary
    set.pop() could evict the sid just added, re-shipping the package on
    every subsequent load_table call (ADVICE round 8, low)."""

    class _SC:
        applicationId = "app-newest"

        def addPyFile(self, p):
            pass

    class _Spark:
        sparkContext = _SC()

    seeded = {f"app-old-{i}": None for i in range(16)}
    monkeypatch.setattr(pq, "_SHIPPED", dict(seeded))
    pq._ship_package(_Spark())
    assert "app-newest" in pq._SHIPPED  # newest survives the bound
    assert len(pq._SHIPPED) == 16
    assert "app-old-0" not in pq._SHIPPED  # oldest was the one evicted


def test_sf_tag_is_lowercase_for_catalog_match(tmp_path):
    """Spark lowercases catalog table names; a mixed-case tag would never
    match in the stale-staging sweep and each session would drop the live
    fixture's own staging tables (ADVICE round 8, low)."""
    d = tmp_path / "SF0.1-Mixed"
    d.mkdir()
    (d / "orders.parquet").write_bytes(b"AAAA")
    tag = entry._sf_tag(str(d))
    assert tag == tag.lower()
    assert tag.startswith("sf0_1_mixed_")


def test_round8_window_is_exactly_the_never_checked_set():
    """The round-8 driver-correctness window must be EXACTLY the queries
    with no CORRECTNESS_r01..r07 row (VERDICT round-7 item #1): 50 unique
    names, all registered, none previously driver-checked, and first in
    queries() iteration order so the driver's 50-slot sample hits all of
    them."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0[1-7].json"))):
        d = json.load(open(f))
        qd = d.get("queries", d)
        checked |= {k for k in qd if k.startswith("q_")}
    if not checked:  # fresh clone without driver artifacts: nothing to pin
        return
    win = entry._ROUND8_WINDOW
    assert len(win) == 50 and len(set(win)) == 50
    q = entry.queries()
    assert set(win) <= set(q)
    assert not (set(win) & checked), set(win) & checked
    never = set(q) - checked
    assert set(win) == never, set(win) ^ never


def test_round9_window_shape():
    """Historical round-9 window (queries() now fronts the round-10
    window): 50 unique registered names. Shape-only — round 9's changed
    set was builder-attested, not artifact-derived; the artifact-driven
    membership check resumed with the round-10 stalest rotation below
    (ADVICE round 9, medium)."""
    win = entry._ROUND9_WINDOW
    assert len(win) == 50 and len(set(win)) == 50
    assert set(win) <= set(entry.queries())


def _latest_driver_round(repo: str, before_round: int) -> dict:
    """Latest driver-CORRECTNESS round per query, from the artifacts of
    rounds < ``before_round`` — a window fixed at round N is derived from
    the evidence that existed BEFORE round N ran.  Globs every
    CORRECTNESS_r*.json and parses the round with a regex (ADVICE r10:
    the old `_r0[1-9]` glob + `[:2]` slice silently dropped two-digit
    rounds like r10)."""
    import glob
    import json
    import os
    import re

    latest: dict = {}
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        if rnd >= before_round:
            continue
        d = json.load(open(f))
        qd = d.get("queries", d)
        for name in qd:
            if name.startswith("q_"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _assert_window_stalest(win, changed, latest):
    assert len(win) == 50 and len(set(win)) == 50
    assert set(win) <= set(entry.queries())
    assert win[: len(changed)] == changed
    order = sorted((r, n) for n, r in latest.items() if n not in set(changed))
    stalest = [n for _, n in order[: 50 - len(changed)]]
    assert win[len(changed):] == stalest, (
        "window's stalest portion drifted from the artifact-derived set"
    )


def test_round10_window_stalest_machine_checked():
    """Historical round-10 window contract (VERDICT r9 item #2 + ADVICE
    r9 medium; queries() now fronts the round-11 window): the round's
    changed queries first, then EXACTLY the stalest — derived from the
    driver evidence that existed before round 10 (rounds 1–9)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = _latest_driver_round(repo, before_round=10)
    if not latest:  # fresh clone without driver artifacts: nothing to pin
        return
    _assert_window_stalest(
        entry._ROUND10_WINDOW, entry._ROUND10_CHANGED, latest
    )


def test_round11_window_stalest_machine_checked():
    """Historical round-11 window contract (VERDICT r10 item #3;
    queries() now fronts the round-12 window): changed queries first,
    then EXACTLY the stalest by (latest driver CORRECTNESS round over
    rounds 1–10, name), filling to 50."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = _latest_driver_round(repo, before_round=11)
    if not latest:  # fresh clone without driver artifacts: nothing to pin
        return
    _assert_window_stalest(
        entry._ROUND11_WINDOW, entry._ROUND11_CHANGED, latest
    )


def test_round12_window_stalest_machine_checked():
    """Historical round-12 window contract (VERDICT r11 item #3;
    queries() now fronts the round-13 window): changed queries first,
    then EXACTLY the stalest by (latest driver CORRECTNESS round over
    rounds 1–11, name), filling to 50."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = _latest_driver_round(repo, before_round=12)
    if not latest:  # fresh clone without driver artifacts: nothing to pin
        return
    _assert_window_stalest(
        entry._ROUND12_WINDOW, entry._ROUND12_CHANGED, latest
    )


def test_round13_window_stalest_machine_checked():
    """Round-13 window contract (VERDICT r12 item #8): changed queries
    first, then EXACTLY the stalest by (latest driver CORRECTNESS round
    over rounds 1–12, name), filling to 50; queries() must front the
    window for the driver's 50-slot sample.  This rotation retires the
    r04 vintage (its last 4 names) — afterwards no query's newest driver
    evidence is older than r05."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = _latest_driver_round(repo, before_round=13)
    if not latest:  # fresh clone without driver artifacts: nothing to pin
        return
    win = entry._ROUND13_WINDOW
    assert list(entry.queries())[:50] == win  # dict-unpacking fronts it
    _assert_window_stalest(win, entry._ROUND13_CHANGED, latest)


def test_sf_tag_fingerprints_input_data(tmp_path):
    """_sf_tag must distinguish (a) two directories sharing a basename
    and (b) the same directory after its data changes — so persistent
    staging tables never replay-skip onto tables staged from other data
    (ADVICE round 7, medium)."""
    import os
    import time

    a = tmp_path / "x" / "sf0.1"
    b = tmp_path / "y" / "sf0.1"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    (a / "orders.parquet").write_bytes(b"AAAA")
    (b / "orders.parquet").write_bytes(b"AAAA")
    ta, tb = entry._sf_tag(str(a)), entry._sf_tag(str(b))
    assert ta.startswith("sf0_1_") and tb.startswith("sf0_1_")
    assert ta != tb  # same basename, different path
    t1 = entry._sf_tag(str(a))
    assert t1 == ta  # stable while data unchanged
    time.sleep(0.01)
    (a / "orders.parquet").write_bytes(b"BBBBBB")  # regenerated fixture
    assert entry._sf_tag(str(a)) != ta


def test_release_transient_checkpoints_protects_live_legs(spark, monkeypatch):
    """Deterministic checkpoint release (VERDICT r9 item #5): persistent
    RDDs NOT owned by a live memoized shared leg are unpersisted
    immediately; the leg's own blocks survive and stay readable. This is
    what lets a long-lived session (and the cold bench sweep) drop dead
    localCheckpoint blocks without waiting for a JVM GC."""
    from pyspark.sql import functions as F

    leg = spark.range(50_000).select("id").localCheckpoint(eager=True)
    transient = (
        spark.range(50_000)
        .select((F.col("id") * 3).alias("v"))
        .localCheckpoint(eager=True)
    )
    monkeypatch.setitem(
        entry._PAIRS_SHARED, ("test-session", "test-dir", "test-leg"), leg
    )
    released = entry.release_transient_checkpoints(spark)
    assert released >= 1
    live_ids = {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    leg_id = leg._jdf.queryExecution().analyzed().rdd().id()
    tr_id = transient._jdf.queryExecution().analyzed().rdd().id()
    assert leg_id in live_ids, "live shared leg must keep its blocks"
    assert tr_id not in live_ids, "transient checkpoint must be dropped"
    assert leg.count() == 50_000  # still readable after the sweep


def test_release_transient_checkpoints_fails_closed(spark, monkeypatch):
    """ADVICE r10: if ANY live shared leg's RDD id cannot be extracted,
    the sweep must be SKIPPED rather than run with an incomplete
    protected set — unpersisting a live localCheckpoint fails hard on
    next read instead of recomputing.  ADVICE r11: the skip returns the
    sentinel -1 (0 would be indistinguishable from 'nothing to
    release'), which bench.py counts into BENCH_FULL."""
    from pyspark.sql import functions as F

    transient = (
        spark.range(10_000)
        .select((F.col("id") * 7).alias("v"))
        .localCheckpoint(eager=True)
    )
    # a leg whose id extraction throws (stands in for a py4j hiccup)
    monkeypatch.setitem(
        entry._PAIRS_SHARED, ("s", "d", "broken-leg"), object()
    )
    assert entry.release_transient_checkpoints(spark) == -1
    live_ids = {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    tr_id = transient._jdf.queryExecution().analyzed().rdd().id()
    assert tr_id in live_ids, "fail-closed sweep must not unpersist anything"
    transient.unpersist()


def test_ship_package_different_contents_is_not_benign(monkeypatch):
    """'already registered with a different path/contents' means the
    context holds someone else's module under our name — a REAL failure,
    not the benign duplicate-add: the session must stay unmarked so the
    next call retries."""
    class _SC:
        applicationId = "app-ship-diff"

        def addPyFile(self, p):
            raise RuntimeError(
                "File X was already registered with a different path"
            )

    class _Spark:
        sparkContext = _SC()

    import warnings

    monkeypatch.setattr(pq, "_SHIPPED", {})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pq._ship_package(_Spark())
    assert "app-ship-diff" not in pq._SHIPPED


def test_grouped_row_number_null_group_keys(spark):
    """A NULL group key spanning range partitions must still get one
    contiguous 1..n rank sequence (null-safe offset join), matching
    Window.partitionBy semantics where NULLs group together."""
    from pyspark.sql import functions as F

    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.operators.ranks import (
        grouped_row_number,
    )

    rows = [(None if i % 2 else "g", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = grouped_row_number(
        df, ["grp"], [F.col("v").asc()], rank_col="rn", count_col="n",
        num_parts=8,
    ).collect()
    null_rn = sorted(r.rn for r in out if r.grp is None)
    g_rn = sorted(r.rn for r in out if r.grp == "g")
    assert null_rn == list(range(1, 1001))
    assert g_rn == list(range(1, 1001))
    assert all(r.n == 1000 for r in out)


def test_grouped_running_sum_matches_window_reference(spark):
    """grouped_running_sum must equal a plain per-group window prefix
    sum exactly — including a NULL group spanning range partitions
    (null-safe offset join) and negative values. Integer-only contract:
    the driver fold and local windows add in different orders."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.operators.ranks import (
        grouped_running_sum,
    )

    rng = random.Random(13)
    rows = [
        (None if i % 3 == 0 else f"g{i % 3}", i, rng.randint(-500, 500))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "grp string, o long, c long")
    got = {
        (r.grp, r.o): r["__rsum"]
        for r in grouped_running_sum(
            df, ["grp"], [F.col("o").asc()], "c", num_parts=8
        ).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("o").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.grp, r.o): r.rs
        for r in df.select(
            "grp", "o", F.sum("c").over(w).alias("rs")
        ).collect()
    }
    assert got == want


def test_radix_kth_raises_on_k_beyond_group(spark):
    from pyspark.sql import functions as F
    import pytest

    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.operators.relational import (
        radix_kth_by_group,
    )

    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
    with pytest.raises(ValueError, match="exceeds available rows"):
        radix_kth_by_group(df, "g", F.col("v"), {"a": 3}, 4)


def test_drop_staged_sweeps_stale_fingerprint_tables(spark, monkeypatch):
    """Tables staged under an OLD input fingerprint are swept when the
    live_prefix/live_tag sweep runs; the current-tag set survives. Closes
    the growth path the fingerprinted _sf_tag opened."""
    spark.sql("CREATE TABLE IF NOT EXISTS default.q_ttp_v2_sf0_1_deadbeef (x INT) USING parquet")
    spark.sql("CREATE TABLE IF NOT EXISTS default.q_ttp_v2_sf0_1_cafef00d (x INT) USING parquet")
    monkeypatch.setattr(entry, "_SWEPT", set())
    entry._drop_staged(
        spark, "tt-test", "q_tt_nonexistent_",
        live_prefix="q_ttp_v2_", live_tag="sf0_1_cafef00d",
    )
    names = {t.name for t in spark.catalog.listTables("default")}
    assert "q_ttp_v2_sf0_1_deadbeef" not in names  # stale fingerprint: swept
    assert "q_ttp_v2_sf0_1_cafef00d" in names  # live fingerprint: kept
    spark.sql("DROP TABLE IF EXISTS default.q_ttp_v2_sf0_1_cafef00d")


def test_scale_fixture_perturbs_embeddings_and_text(tmp_path):
    """VERDICT r11 item #5: the scale fixture must not replicate
    embeddings verbatim — copies get a per-copy Rademacher sign pattern
    that (a) preserves each vector's norm exactly, (b) preserves
    WITHIN-copy cosines exactly (the per-copy pair structure mirrors the
    original corpus), and (c) decorrelates a vector from its own
    replicas (no fixture-made exact-duplicate clusters).  Runs the real
    script at 3 copies over sf0.001; both branches (UNION-ALL and the
    lateral range drive used past 20 copies) share the hash(i*131+d)
    pattern, so pinning one pins the expression."""
    import math
    import os
    import subprocess
    import sys as _sys

    import duckdb
    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = str(tmp_path / "sfx")
    subprocess.run(
        [
            _sys.executable,
            os.path.join(repo, "scripts", "make_scale_fixture.py"),
            "/root/testdata/sf0.001",
            dst,
            "3",
            "embeddings,documents",
        ],
        check=True,
        capture_output=True,
    )
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{dst}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    n = len(rows) // 3
    orig = dict(rows[:n])
    off = rows[n][0]
    copy1 = {v - off: e for v, e in rows[n : 2 * n]}
    assert set(orig) == set(copy1)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    ids = sorted(orig)[:20]
    for v in ids:
        a, b = orig[v], copy1[v]
        assert [abs(x) for x in a] == [abs(x) for x in b]  # norm + |coords|
        na = math.sqrt(dot(a, a))
        if na:  # (c) a replica is NOT its own near-duplicate
            assert abs(dot(a, b)) / dot(a, a) < 0.9
    for i in range(5):  # (b) within-copy cosines preserved exactly
        for j in range(i + 1, 5):
            assert dot(orig[ids[i]], orig[ids[j]]) == pytest.approx(
                dot(copy1[ids[i]], copy1[ids[j]]), rel=1e-9
            )
    # the documents perturbation still holds alongside
    assert con.sql(
        f"SELECT count(*) FROM '{dst}/documents.parquet' WHERE"
        " text LIKE '% zq1x'"
    ).fetchone()[0] == n


def test_blas_thread_pin_propagates(spark):
    """Round-12 BLAS pin: importing the package caps worker BLAS thread
    pools (numpy's bundled OpenBLAS defaults to ncpu threads PER WORKER
    — local[32] ran ~1024 runnable threads and the matmul kernels
    degraded up to 5x). Three contracts: the env caps are set in this
    process (the local-mode inheritance root for JVM -> worker daemon
    -> workers), get_spark forwards them to spark.executorEnv.* for
    real clusters, and a worker-side probe observes the cap."""
    import os

    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS"):
        assert os.environ.get(var), f"{var} not pinned at package import"
        assert spark.conf.get(f"spark.executorEnv.{var}") == os.environ[var]

    # worker-side: the env the kernel processes actually see
    seen = (
        spark.range(1)
        .rdd.map(
            lambda _: __import__("os").environ.get(
                "OPENBLAS_NUM_THREADS", "MISSING"
            )
        )
        .collect()
    )
    assert seen == [os.environ["OPENBLAS_NUM_THREADS"]]


def test_blas_runtime_cap_closes_foreign_session_hole(monkeypatch):
    """ADVICE r12: the env pin only reaches workers forked AFTER the
    package import; under a foreign SparkSession the JVM (and its worker
    daemon) may predate it, leaving OpenBLAS at ncpu threads. The
    worker-side fallback must cap the ALREADY-LOADED BLAS at runtime
    through its own C entry point when no env pin reached the process."""
    import ctypes
    import glob
    import os

    import numpy

    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.functions import (
        blas,
    )

    libs = glob.glob(
        os.path.abspath(
            os.path.join(
                os.path.dirname(numpy.__file__), "..", "numpy.libs",
                "libopenblas*.so*",
            )
        )
    )
    if not libs:  # exotic BLAS build: the fallback is best-effort by design
        return
    lib = ctypes.CDLL(libs[0])
    get = getattr(lib, "openblas_get_num_threads64_", None) or getattr(
        lib, "openblas_get_num_threads", None
    )
    st = getattr(lib, "openblas_set_num_threads64_", None) or getattr(
        lib, "openblas_set_num_threads", None
    )
    if get is None or st is None:
        return
    before = get()
    try:
        st(4)  # simulate the unpinned foreign-session worker state
        monkeypatch.delenv("OPENBLAS_NUM_THREADS", raising=False)
        monkeypatch.setattr(blas, "_DONE", False)
        blas.ensure_blas_pinned()
        assert get() == 1, "runtime cap did not reach the loaded OpenBLAS"
        # and it is once-per-process: a second call is a no-op guard
        st(4)
        blas.ensure_blas_pinned()
        assert get() == 4
    finally:
        st(before)
