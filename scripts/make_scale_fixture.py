"""Synthesize a larger-scale fixture by key-shifted replication of an
existing testdata directory (default: 10x sf0.1 -> a /tmp 'sf1').

The driver-generated fixtures stop at sf0.1; SCALE.md's measured-scaling
table needs a point where the corpus legs dominate fixed per-query cost.
Replication preserves every schema and marginal distribution; keys shift
by copy so uniqueness invariants hold. Two deliberate perturbations keep
the PROBLEM size linear in the data (not quadratic):

* documents.text gets a per-copy suffix token for copies >= 1 - exact
  replicas would turn every doc into a 10-way near-duplicate cluster and
  blow the pair graph up 45x instead of 10x;
* embeddings.embedding gets a per-copy deterministic Rademacher sign
  pattern for copies >= 1 (dim d of copy i flips sign iff
  hash(i*131+d) is odd) — VERDICT r11 item #5: verbatim replicas made
  every vector a copies-way EXACT duplicate, so at 10000x the TRUE
  semdedup output was ~1e11 pairs (a fixture artifact, not a workload).
  Sign flips keep the norm and |coordinate| marginals exact, keep
  WITHIN-copy cosines identical to the originals (cos(s.x, s.y) =
  cos(x, y)), and decorrelate CROSS-copy pairs (cos(s.x, x) is a
  Rademacher average concentrated near 0) — so the true pair count
  scales ~linearly in copies, like the perturbed text does;
* everything else replicates verbatim.

Usage: python scripts/make_scale_fixture.py [src_dir] [dst_dir] [copies]
       [tables]
Never writes outside dst_dir (default /tmp/sparkgraft_sf1). ``tables``
(comma-separated, default all) restricts the build — e.g.
``orders,lineitem`` for the 1000× order-statistics probe, where the
text/embedding tables would dominate build time without being read.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

# (table, key columns to shift, text perturbation?)
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # stream COPY instead of materializing: with insertion order pinned,
    # the 1000× cross-join build buffered the whole fact table in memory
    # (~55 GB RSS before being killed); row order is irrelevant to every
    # consumer (all queries declare their own ordering)
    con.sql("SET preserve_insertion_order=false")
    con.sql("SET memory_limit='24GB'")
    # one offset per shifted column family: next power of 10 above the max
    offs: dict[str, int] = {}
    for t, keys in SHIFTS.items():
        for k in keys:
            m = con.sql(
                f"SELECT max({k}) FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
            off = 10 ** len(str(int(m)))
            offs[k] = max(offs.get(k, 0), off)
    # foreign keys shift by the REFERENCED key's offset
    offs["o_custkey"] = offs["c_custkey"]
    offs["l_orderkey"] = offs["o_orderkey"]
    offs["l_partkey"] = offs["p_partkey"]
    offs["l_suppkey"] = offs["s_suppkey"]
    # identity-linked columns must share one offset: embeddings.vec_id is
    # joined 1:1 onto documents.doc_id (q_cluster_terms etc.); independent
    # per-column offsets only coincide when both maxes have the same digit
    # count (ADVICE round 8, low).
    offs["vec_id"] = offs["doc_id"] = max(offs["vec_id"], offs["doc_id"])

    for t, keys in SHIFTS.items():
        if ONLY is not None and t not in ONLY:
            continue
        src = f"'{SRC}/{t}.parquet'"
        if not keys:  # dims: copy verbatim
            con.sql(f"COPY (SELECT * FROM {src}) TO '{DST}/{t}.parquet'")
            continue
        col_names = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        if COPIES > 20:
            # cross-join form: a UNION ALL of 1000 SELECTs is a monster
            # to plan; one lateral range drive scales to any copy count
            cols = []
            for name in col_names:
                if name in keys:
                    cols.append(
                        f"({name} + cp.i * {offs[name]})::BIGINT AS {name}"
                    )
                elif t == "documents" and name == "text":
                    cols.append(
                        "CASE WHEN cp.i = 0 THEN text ELSE text || ' zq' "
                        "|| cp.i::VARCHAR || 'x' END AS text"
                    )
                elif t == "documents" and name == "n_chars":
                    cols.append(
                        "CASE WHEN cp.i = 0 THEN n_chars ELSE (n_chars + 4 "
                        "+ length(cp.i::VARCHAR))::BIGINT END AS n_chars"
                    )
                elif t == "embeddings" and name == "embedding":
                    cols.append(
                        "CASE WHEN cp.i = 0 THEN embedding ELSE "
                        "list_transform(embedding, (x, d) -> (x * (CASE "
                        "WHEN hash(cp.i * 131 + d) % 2 = 0 THEN 1 ELSE -1 "
                        "END))::FLOAT)::FLOAT[] END AS embedding"
                    )
                else:
                    cols.append(name)
            con.sql(
                f"COPY (SELECT {', '.join(cols)} FROM {src}, "
                f"(SELECT range::BIGINT AS i FROM range({COPIES})) cp) "
                f"TO '{DST}/{t}.parquet'"
            )
        else:
            selects = []
            for i in range(COPIES):
                cols = []
                for name in col_names:
                    if name in keys:
                        cols.append(f"({name} + {i * offs[name]})::BIGINT AS {name}")
                    elif t == "documents" and name == "text" and i > 0:
                        cols.append(f"text || ' zq{i}x' AS text")
                    elif t == "documents" and name == "n_chars" and i > 0:
                        cols.append(f"(n_chars + {len(f' zq{i}x')})::BIGINT AS n_chars")
                    elif t == "embeddings" and name == "embedding" and i > 0:
                        cols.append(
                            "list_transform(embedding, (x, d) -> (x * "
                            f"(CASE WHEN hash({i} * 131 + d) % 2 = 0 THEN "
                            "1 ELSE -1 END))::FLOAT)::FLOAT[] AS embedding"
                        )
                    else:
                        cols.append(name)
                selects.append(f"SELECT {', '.join(cols)} FROM {src}")
            union = " UNION ALL ".join(selects)
            con.sql(f"COPY ({union}) TO '{DST}/{t}.parquet'")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
