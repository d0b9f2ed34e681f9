"""Independent spot oracle for q_clustering_coeff at stress scales where
the naive spec oracle is infeasible.

At synthetic sf10 the stress generator keeps the 20k part-key space while
scaling lineitem 100x, so the co-purchase graph is ~1000x denser than
real data (~65M edges over 20k nodes, avg degree ~6.5k): the gate's
naive DuckDB oracle must materialize Sigma deg^2 ~ 4e11 wedges, which
exceeds any disk in this container.  The engine's degree-oriented wedge
plan still completes — this script verifies that output without the
wedge blowup:

- degree: compared EXACTLY for every node (cheap group-by in DuckDB);
- n_triangles / coeff: compared EXACTLY for a sample of nodes (the
  max/min-degree nodes plus hash-picked ones) using the identity
  triangles(v) = |edges among neighbors(v)| — per-node cost is
  deg(v)^2 probes against the edge set, feasible for any single node.

Usage: python scripts/spot_check_clustering.py [sf_dir] [n_sample]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.stress/sf10"
N_SAMPLE = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.environ.setdefault("JANUS_DRIVER_MEM", "24g")
os.environ.setdefault("JANUS_MAX_RESULT_SIZE", "8g")


def main() -> int:
    import __spark_entry__ as entry_mod
    from janus_spark.session import get_spark

    spark = get_spark("spot-clustering")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"engine: q_clustering_coeff @ {SF_DIR}", flush=True)
    sdf = entry_mod.queries()["q_clustering_coeff"](spark, SF_DIR)
    engine = {r["id"]: (r["deg"], r["n_triangles"], r["coeff"]) for r in sdf.collect()}
    print(f"engine rows: {len(engine)}", flush=True)

    con = duckdb.connect()
    spill = os.environ.get("JANUS_DUCKDB_TMP", "/tmp/duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    print("oracle: materializing the co-purchase edge set", flush=True)
    con.execute(f"""
        CREATE TEMP TABLE e AS
        WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                    FROM read_parquet('{SF_DIR}/lineitem.parquet'))
        SELECT DISTINCT x.p AS a, y.p AS b
        FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p""")
    n_edges = con.execute("SELECT COUNT(*) FROM e").fetchone()[0]
    print(f"oracle edges: {n_edges}", flush=True)

    # exact degree for EVERY node (the gate filters deg >= 2)
    deg = dict(con.execute("""
        SELECT id, COUNT(*) AS deg FROM (
          SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        GROUP BY id HAVING COUNT(*) >= 2""").fetchall())
    if set(deg) != set(engine):
        print(f"FAIL node-set mismatch: oracle {len(deg)} vs engine {len(engine)}")
        return 1
    bad = [v for v in deg if engine[v][0] != deg[v]]
    if bad:
        print(f"FAIL degree mismatch on {len(bad)} nodes, e.g. {bad[:3]}")
        return 1
    print(f"degree: EXACT for all {len(deg)} nodes", flush=True)

    # exact triangles for sampled nodes: extremes + md5-picked spread
    by_deg = sorted(deg, key=lambda v: (deg[v], v))
    sample = {by_deg[0], by_deg[-1], by_deg[len(by_deg) // 2]}
    picked = con.execute(f"""
        SELECT id FROM (SELECT DISTINCT a AS id FROM e UNION SELECT b FROM e)
        ORDER BY md5(CAST(id AS VARCHAR)) LIMIT {N_SAMPLE}""").fetchall()
    sample.update(v for (v,) in picked)
    fails = 0
    for v in sorted(sample):
        tri = con.execute(f"""
            WITH nb AS (SELECT b AS n FROM e WHERE a = {v}
                        UNION ALL SELECT a FROM e WHERE b = {v})
            SELECT COUNT(*) FROM e
            JOIN nb n1 ON e.a = n1.n JOIN nb n2 ON e.b = n2.n""").fetchone()[0]
        want_deg, want_tri, want_coeff = engine[v]
        coeff = 2.0 * tri / (deg[v] * (deg[v] - 1))
        ok = want_tri == tri and want_coeff == coeff
        print(f"  node {v}: deg={deg[v]} tri={tri} coeff={coeff:.6f} "
              f"-> {'EXACT' if ok else f'MISMATCH engine=({want_tri},{want_coeff})'}",
              flush=True)
        fails += 0 if ok else 1
    if fails:
        print(f"FAIL: {fails}/{len(sample)} sampled nodes mismatched")
        return 1
    print(f"OK q_clustering_coeff @ {SF_DIR}: degree EXACT all nodes; "
          f"triangles+coeff EXACT on {len(sample)} sampled nodes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
