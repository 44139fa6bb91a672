#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--json <artifact>]
       [--per-query-timeout <sec>]

--per-query-timeout interrupts any single oracle SQL after N seconds
(DuckDB con.interrupt() from a watchdog thread) and records the query
as err="oracle timeout". For SCALED-TIER runs only: an iterative oracle
(q67's 5-round PageRank CTE) that is trivial for the engine can be
infeasible for DuckDB at 10x+ (it spilled >45GB before this knob
existed). The driver's sf0.01 gate never needs it.

With --json, also writes a CORRECTNESS_r{N}.json-shaped artifact
(per-query rows/schema/hash match booleans) so off-gate tiers — the
standing sf0.1 run — leave a machine-diffable record per round instead
of only stdout.

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the sf parquet
tables, and compares: column names (sorted), row count, and a hash of the
value matrix after sorting columns by name and rows by their stringified
values. Prints per-query PASS/FAIL.
"""
import functools, sys, json, glob, hashlib, math
print = functools.partial(print, flush=True)
import duckdb
import pandas as pd


def canon(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        # np.float64 subclasses float; convert so repr has no np prefix.
        # DuckDB HUGEINT (uncast SUM(int)) reaches pandas as float64 and
        # renders "8711.0" vs Spark BIGINT "8711" — exactly what the
        # driver's hash sees, so an uncast oracle fails here too.
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(round(f, 9))
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    per_q_timeout = None
    if "--per-query-timeout" in sys.argv:
        per_q_timeout = float(sys.argv[sys.argv.index("--per-query-timeout") + 1])
    artifact = {}

    def record(name, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        artifact[name] = {"rows_match": rows_match, "schema_match": schema_match,
                          "hash_match": hash_match, "spark_rows": spark_rows,
                          "oracle_rows": oracle_rows, "err": err}

    con = duckdb.connect()
    # heavy oracles at scaled tiers (pair generators over millions of
    # docs) must spill, not eat the box: cap memory and give DuckDB a
    # temp dir. No effect on the small-SF driver gate.
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET max_temp_directory_size='30GB'")
    import os
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        # driver sf dirs ship single files; ScaleFixture tiers are Spark
        # output DIRECTORIES — glob their part files for DuckDB
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, err="no spark output")
            n_fail += 1
            continue
        try:
            # Fetch via pandas, not fetchall(): Python ints erase the
            # HUGEINT-vs-BIGINT distinction the driver's hash is
            # sensitive to (round-2 lesson: local gate said 107/107
            # while the driver failed 2 on exactly this).
            gdf = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
            got_cols = list(gdf.columns)
            got = list(gdf.itertuples(index=False, name=None))
            watchdog = None
            if per_q_timeout:
                import threading
                watchdog = threading.Timer(per_q_timeout, con.interrupt)
                watchdog.start()
            try:
                wdf = con.execute(sql).df()
            finally:
                if watchdog:
                    watchdog.cancel()
            want_cols = list(wdf.columns)
            want = list(wdf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            record(name, err=str(e)[:300])
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            record(name, rows_match=len(got) == len(want),
                   spark_rows=len(got), oracle_rows=len(want))
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            record(name, schema_match=True,
                   spark_rows=len(got), oracle_rows=len(want))
            n_fail += 1
        elif table_hash(got_cols, got) != table_hash(want_cols, want):
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(got), oracle_rows=len(want))
            ordg = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            ordw = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
            sg = sorted(tuple(canon(r[i]) for i in ordg) for r in got)
            sw = sorted(tuple(canon(r[i]) for i in ordw) for r in want)
            shown = 0
            for a, b in zip(sg, sw):
                if a != b and shown < 3:
                    print(f"  spark={a}\n  duck ={b}")
                    shown += 1
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(got), oracle_rows=len(want))
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
