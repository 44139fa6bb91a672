#!/usr/bin/env python3
"""Tier-scale correctness gate for the two queries whose full DuckDB
oracle is infeasible at 10x+ (round-10 verdict #3): q67_pagerank and
s10_semantic_clusters. Both are verified EXACTLY — no sampling, no
invariant-only weakening — by restructuring the oracle so nothing
recursive or quadratic runs:

 q67 (STEPWISE REPLAY): the engine dumps every iteration's full rank
   vector (`graft.pagerank.traceDir`). DuckDB then checks, per step k,
   that R_k equals ONE power-iteration step applied to the ENGINE'S OWN
   R_{k-1} (a single join+aggregation over the edge list), with R_0 the
   uniform vector it derives itself. By induction the final vector is
   exactly the 5-round PageRank — the same proof the recursive CTE gave,
   without ever materializing the iteration inside DuckDB (which spilled
   >27 GB at the 10x tier). Step outputs compare on the registry's own
   ROUND(r*1e6, 2) ppm grid; the final step additionally hash-matches
   the published q67 result parquet.

 s10 (LINEAR CC CERTIFICATE): the engine's labelling is verified to BE
   the connected components of the near-dup pair graph via four checks,
   none quadratic:
   (a) vertex coverage: labelled set == pair-graph vertex set;
   (b) no under-merge: every edge has both endpoints under one label
       (one join);
   (c) labels are canonical: each label is the MIN vec_id of its group
       and a member of it;
   (d) no over-merge: every vertex is REACHABLE from its label vertex
       through edges that stay inside its group — a multi-source
       recursive CTE whose working set is <= |V| rows total (each
       vertex is reached under exactly one root), vs the |comp|^2 rows
       of the old all-pairs closure.
   (a)+(b) prove every component lies inside one label group;
   (d) proves every label group lies inside one component; (c) pins the
   label choice — together the output is exactly the closure oracle's.
   The pair graph itself is DuckDB-recomputed from the embeddings with
   the ENGINE'S corpus-scaled band width (s2BitsFor), non-recursively.

Usage:
  python3 tools/tier_gate.py <tierDir> <verifyOutDir> <q67TraceDir> \
      [--artifact tools/correctness_sf1_heavies.json]

With --artifact, the q67/s10 rows of the heavies artifact are replaced
with this gate's verdicts (method recorded in the row).
"""
import functools, glob, json, math, os, sys
print = functools.partial(print, flush=True)
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import table_hash


def read_result(out_dir, name):
    files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    if not files:
        raise SystemExit(f"no result parquet for {name} under {out_dir}")
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False)]


# ---------------------------------------------------------------- q67

def check_q67(con, verify_out, trace_dir):
    # materialize the graph ONCE as temp tables: the CTE form re-inlines
    # the 6M-row lineitem-orders join per reference and DuckDB's planner
    # spilled >27 GB on it — exactly the infeasibility this gate routes
    # around. Materialized, the whole graph is ~160k nodes / 12M edges
    # and each verification step is a sub-second join.
    con.sql("""CREATE OR REPLACE TEMP TABLE pr_edges AS
        SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2""")
    con.sql("""CREATE OR REPLACE TEMP TABLE pr_e AS
        SELECT src, dst, w FROM pr_edges
        UNION ALL SELECT dst, src, w FROM pr_edges""")
    con.sql("""CREATE OR REPLACE TEMP TABLE pr_deg AS
        SELECT src, SUM(w) AS wout FROM pr_e GROUP BY 1""")
    n = con.sql("SELECT count(*) FROM pr_deg").fetchone()[0]
    stages = []
    for k in range(1, 6):
        prev = (
            f"SELECT src AS node, 1.0 / {n} AS r FROM pr_deg"
            if k == 1 else
            f"SELECT node, r FROM read_parquet('{trace_dir}/r{k-1}/*.parquet')")
        step = con.sql(f"""
            SELECT e.dst AS node,
                   ROUND((0.15 / {n} + 0.85 * SUM(p.r * (e.w / d.wout))) * 1000000, 2) AS rank_ppm
            FROM pr_e e JOIN ({prev}) p ON p.node = e.src
                 JOIN pr_deg d ON d.src = e.src
            GROUP BY e.dst""").fetchall()
        eng = con.sql(f"""
            SELECT node, ROUND(r * 1000000, 2) AS rank_ppm
            FROM read_parquet('{trace_dir}/r{k}/*.parquet')""").fetchall()
        ok = (len(step) == len(eng) and
              table_hash(["node", "rank_ppm"], step) ==
              table_hash(["node", "rank_ppm"], eng))
        stages.append(ok)
        print(f"q67 step {k}: engine R{k} "
              f"{'==' if ok else '!='} one-step(R{k-1}) [{len(eng)} nodes]")
        if not ok:
            return dict(err=f"step {k} mismatch", rows_match=False,
                        schema_match=False, hash_match=False,
                        spark_rows=len(eng), oracle_rows=len(step))
    # the published result must BE the traced final vector
    got_cols, got = read_result(verify_out, "q67_pagerank")
    want = con.sql(f"""
        SELECT CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END AS kind,
               CAST(node // 2 AS BIGINT) AS key,
               ROUND(r * 1000000, 2) AS rank_ppm
        FROM read_parquet('{trace_dir}/r5/*.parquet')""").fetchall()
    schema_ok = sorted(got_cols) == ["key", "kind", "rank_ppm"]
    hash_ok = table_hash(got_cols, got) == table_hash(
        ["kind", "key", "rank_ppm"], want)
    print(f"q67 published result vs trace R5: "
          f"{'match' if hash_ok else 'MISMATCH'} ({len(got)} rows)")
    ok = all(stages) and schema_ok and hash_ok
    return dict(err=None if ok else "published != trace",
                rows_match=len(got) == len(want), schema_match=schema_ok,
                hash_match=ok, spark_rows=len(got), oracle_rows=len(want),
                method="stepwise replay: R_k == one-step(engine R_{k-1}) "
                       "for k=1..5 from uniform R_0, ppm grid; published "
                       "row hash == trace R5")


# ---------------------------------------------------------------- s10

S2_BANDS = 16


def s2_bits_for(n):
    buckets = max(1, n // 2)
    ceil_log2 = 0 if buckets <= 1 else (buckets - 1).bit_length()
    return max(10, ceil_log2)


def pair_sql(width):
    return f"""
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes AS (
  SELECT p, list_transform(generate_series(0, 63), i ->
    (CAST(('0x' || substring(md5('s2:' || p || ':' || i), 1, 8)) AS BIGINT) % 2001 - 1000) / 1000.0) AS w
  FROM generate_series(0, {S2_BANDS * width - 1}) AS t(p)
), bits AS (
  SELECT e.vec_id, p.p,
         CASE WHEN list_dot_product(e.v, p.w) > 0
              THEN CAST(1 AS BIGINT) << (p.p % {width}) ELSE 0 END AS bit
  FROM e CROSS JOIN planes p
), codes AS (
  SELECT vec_id, p // {width} AS band, CAST(SUM(bit) AS BIGINT) AS code
  FROM bits GROUP BY vec_id, p // {width}
), probes AS (
  SELECT vec_id, band,
         CAST(xor(code, CASE WHEN k = 0 THEN 0
                             ELSE CAST(1 AS BIGINT) << (k - 1) END) AS BIGINT) AS pk
  FROM codes CROSS JOIN generate_series(0, {width}) AS g(k)
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM probes a JOIN codes b
    ON a.band = b.band AND a.pk = b.code AND a.vec_id < b.vec_id
), pr AS (
  SELECT vec_a, vec_b,
         list_dot_product(ea.v, eb.v) /
           (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS c
  FROM cand
  JOIN e ea ON ea.vec_id = vec_a
  JOIN e eb ON eb.vec_id = vec_b
)
SELECT vec_a, vec_b FROM pr WHERE c >= 0.45"""


def check_s10(con, verify_out):
    n = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
    width = s2_bits_for(n)
    print(f"s10: {n} vectors -> band width {width} (engine s2BitsFor)")
    con.sql(f"CREATE OR REPLACE TEMP TABLE pairs AS WITH {pair_sql(width)}")
    con.sql("""CREATE OR REPLACE TEMP TABLE ed AS
               SELECT vec_a AS s, vec_b AS t FROM pairs
               UNION ALL SELECT vec_b, vec_a FROM pairs""")
    n_pairs = con.sql("SELECT count(*) FROM pairs").fetchone()[0]
    got_cols, got = read_result(verify_out, "s10_semantic_clusters")
    schema_ok = sorted(got_cols) == ["cluster_id", "vec_id"]
    eng = pd.DataFrame(got, columns=got_cols)
    con.register("E", eng)
    # (a) coverage: labelled set == pair-graph vertex set
    cov = con.sql("""
        SELECT count(*) FROM (
          (SELECT s AS v FROM ed EXCEPT SELECT vec_id FROM E)
          UNION ALL
          (SELECT vec_id FROM E EXCEPT SELECT s FROM ed))""").fetchone()[0]
    # (b) no under-merge: every edge inside one label
    under = con.sql("""
        SELECT count(*) FROM pairs p
        JOIN E a ON a.vec_id = p.vec_a JOIN E b ON b.vec_id = p.vec_b
        WHERE a.cluster_id <> b.cluster_id""").fetchone()[0]
    # (c) canonical labels: min of the group, and a member of it
    canon_bad = con.sql("""
        SELECT (SELECT count(*) FROM (
                  SELECT cluster_id, min(vec_id) AS mn FROM E GROUP BY 1)
                WHERE cluster_id <> mn)
             + (SELECT count(*) FROM E a WHERE NOT EXISTS (
                  SELECT 1 FROM E b WHERE b.vec_id = a.cluster_id
                  AND b.cluster_id = a.cluster_id))""").fetchone()[0]
    # (d) no over-merge: every vertex reachable from its label vertex
    # through in-group edges (working set <= |V| rows: one root each)
    unreach = con.sql("""
        WITH RECURSIVE reach(root, v) AS (
          SELECT DISTINCT cluster_id, cluster_id FROM E
          UNION
          SELECT r.root, e2.t FROM reach r
          JOIN ed e2 ON e2.s = r.v
          JOIN E ev ON ev.vec_id = e2.t AND ev.cluster_id = r.root
        )
        SELECT count(*) FROM E ex WHERE NOT EXISTS (
          SELECT 1 FROM reach r
          WHERE r.root = ex.cluster_id AND r.v = ex.vec_id)""").fetchone()[0]
    print(f"s10: pairs={n_pairs} labelled={len(got)} | coverage_viol={cov} "
          f"under_merge={under} non_canonical={canon_bad} unreachable={unreach}")
    ok = schema_ok and cov == 0 and under == 0 and canon_bad == 0 and unreach == 0
    n_vertices = con.sql("SELECT count(DISTINCT s) FROM ed").fetchone()[0]
    return dict(err=None if ok else
                f"cov={cov} under={under} canon={canon_bad} unreach={unreach}",
                rows_match=cov == 0 and len(got) == n_vertices,
                schema_match=schema_ok, hash_match=ok,
                spark_rows=len(got), oracle_rows=n_vertices,
                method="linear CC certificate over DuckDB-recomputed "
                       f"width-{width} LSH pairs: coverage + edge "
                       "consistency + canonical-min labels + in-group "
                       "reachability (<=|V| closure rows)")


def main():
    tier_dir, verify_out, trace_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    artifact = None
    if "--artifact" in sys.argv:
        artifact = sys.argv[sys.argv.index("--artifact") + 1]
    con = duckdb.connect()
    con.sql("SET max_temp_directory_size='30GB'")
    for t in ("lineitem", "orders", "embeddings"):
        # ScaleFixture tiers are Spark output DIRECTORIES (compare.py
        # has the same dispatch); driver sf dirs ship single files
        p = f"{tier_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    rows = {"q67_pagerank": check_q67(con, verify_out, trace_dir),
            "s10_semantic_clusters": check_s10(con, verify_out)}
    n_fail = 0
    for name, r in rows.items():
        ok = r["hash_match"] and r["err"] is None
        print(f"{'PASS' if ok else 'FAIL'} {name} ({r['spark_rows']} rows)")
        n_fail += 0 if ok else 1
    if artifact:
        with open(artifact) as f:
            art = json.load(f)
        art.update(rows)
        with open(artifact, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
        print(f"updated {artifact}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
