#!/usr/bin/env python3
"""Dev-only correctness checker mirroring the driver's DuckDB oracle gate.

NOT part of the engine (the Scala library has no Python dependency) —
this reproduces the driver's t2 loop locally so oracle SQL can be
debugged before a round ends:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    """Sort columns by name (like the driver), normalize cells."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows], \
        [cols[i] for i in order]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = list(got_rel.columns)
            got_types = dict(zip(got_cols, map(str, got_rel.types)))
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp_types = dict(zip(exp_cols, map(str, exp_rel.types)))
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        # The driver's hasher is sensitive to the PHYSICAL type, not just
        # the Python value: an uncast DuckDB SUM() is HUGEINT (int128) and
        # hashes differently from the BIGINT the engine wrote, even though
        # fetchall() collapses both to int (root cause of the round-9
        # ks_by_source/oov_stream/vocab_coverage reds). Compare exact
        # DuckDB-visible types so that class of divergence fails HERE.
        tdiff = {c: (got_types.get(c), exp_types.get(c))
                 for c in set(got_types) | set(exp_types)
                 if got_types.get(c) != exp_types.get(c)}
        if tdiff:
            print(f"FAIL {name}: type mismatch (got vs oracle): {tdiff}")
            n_fail += 1
            continue
        g, gc = norm_rows(got_cols, got)
        e, ec = norm_rows(exp_cols, exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at row {i}:\n   got {a}\n   exp {b}")
                    break
            else:
                if len(g) != len(e):
                    print(f"  extra rows from row {min(len(g), len(e))}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query names (mirror Verify's
    # subset filter so iterating on one query doesn't spam FAILs for
    # the queries that weren't dumped)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
