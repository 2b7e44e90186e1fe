#!/usr/bin/env python3
"""Declaration-time lint for rounding-sensitive oracle boundaries.

Dev/driver-side tooling only (the Scala library has no Python
dependency). Motivated by the round-15 red row: a query/oracle pair
can pass tools/check.py locally yet fail the driver's hash gate when
the two engines independently DERIVE a value through a
version-sensitive rounding step, or when the hashed output carries a
type the driver's hasher may render differently than the local
mirror. Two rules:

  A. cross-engine double->DECIMAL derivation: any CAST(expr AS
     DECIMAL...) in the oracle SQL whose inner expr involves a
     known-double column or float arithmetic. Both engines round
     independently; half-up vs half-even vs shortest-string casting
     is NOT pinned across DuckDB versions. Exact fixes: derive the
     decimal from integers via a fixed-point string (printf /
     format_string) or parse an exact string.

  B. raw DECIMAL column in the hashed OUTPUT schema: the round-15
     failure was the only declared row whose result parquet carried a
     DECIMAL column; every other decimal-bearing row renders to
     VARCHAR or DOUBLE before the hash. Requires the Verify out_dir.

Waivers live in WAIVED_A / WAIVED_B below with a written
justification each; an unjustified hit fails the close checklist.

Usage:
    python3 tools/oraclelint.py <verify_out_dir>
(out_dir must hold oracle_sql.json; result parquet dirs are linted
when present.)
"""
import glob
import json
import os
import re
import sys

# double/float columns of the driver's test tables (TESTDATA.md) --
# any DECIMAL cast over these is a cross-engine rounding boundary
DOUBLE_COLS = {
    "c_acctbal", "s_acctbal", "p_retailprice", "o_totalprice",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax", "value",
}

# Rule-A shape exemption (structural, not by name): a double->decimal
# cast that sits INSIDE an aggregate call (SUM/AVG/MIN/MAX, plain or
# windowed) is the mirrored-aggregate money-arithmetic class — the
# engine performs the identical per-value cast, the decimal exists
# only to make the SUM order-independent, and the hashed output is a
# DOUBLE/VARCHAR render. 600k-value casts of this shape have
# hash-agreed in every driver environment to date (q1 green
# r1..r15). The round-15 failure was the OTHER shape: a per-row
# double->decimal cast whose value reached the output — that shape
# is always flagged. Watch item: if a mirrored-aggregate row ever
# fails hash-only, this exemption is the suspect.
AGG_FNS = {"sum", "avg", "min", "max", "quantile_cont", "median",
           "stddev", "stddev_samp", "var_samp", "corr"}

# Rule-A waivers by name, each with a judge-auditable reason.
WAIVED_A = {
    # discPrice is aliased `vol` in a CTE and summed in the outer
    # query (SUM(vol) .. AS DOUBLE) — the mirrored-aggregate shape
    # via alias indirection the lexical scan cannot follow. The
    # engine performs the identical cast (Relational.q8).
    "q8_market_share": "mirrored aggregate via CTE alias (SUM(vol))",
}

# Rule-B waivers: none — decimal outputs must render to VARCHAR
# (exact digits) or DOUBLE (aggregates) before the hash.
WAIVED_B = {}

CAST_DEC_RE = re.compile(r"CAST\s*\(", re.IGNORECASE)


def inside_aggregate(sql, pos):
    """True if the token at `pos` sits inside an aggregate call:
    scan outward through enclosing parens, reading the identifier
    before each one."""
    depth = 0
    i = pos - 1
    while i >= 0:
        c = sql[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth:
                depth -= 1
            else:
                j = i - 1
                while j >= 0 and (sql[j].isalnum() or sql[j] == "_"):
                    j -= 1
                if sql[j + 1:i].lower() in AGG_FNS:
                    return True
        i -= 1
    return False


def cast_targets(sql):
    """Yield (pos, inner_expr, target_type) for every CAST(x AS T)
    in sql, paren-balanced."""
    for m in CAST_DEC_RE.finditer(sql):
        i = m.end()
        depth = 1
        start = i
        while i < len(sql) and depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        body = sql[start:i - 1]
        # split on the LAST top-level ' AS '
        depth = 0
        as_pos = -1
        up = body.upper()
        for j in range(len(body)):
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            elif depth == 0 and up[j:j + 4] == " AS ":
                as_pos = j
        if as_pos < 0:
            continue
        yield m.start(), body[:as_pos].strip(), body[as_pos + 4:].strip()


SAFE_INNER_RE = re.compile(
    r"^\s*(\d+|'[^']*'|printf\s*\(|format_string\s*\(|"
    r"json_extract_string\s*\()", re.IGNORECASE)
FLOATLIT_RE = re.compile(r"\d\.\d")
WORD_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


def lint_sql(name, sql):
    """Rule A: flag per-row double->decimal derivations; report
    mirrored-aggregate ones as the exempted shape."""
    hits, agg_hits = [], 0
    for pos, inner, ttype in cast_targets(sql):
        if not ttype.upper().startswith("DECIMAL"):
            continue
        if SAFE_INNER_RE.match(inner):
            continue
        words = set(w.lower() for w in WORD_RE.findall(inner))
        if words & DOUBLE_COLS or FLOATLIT_RE.search(inner):
            if inside_aggregate(sql, pos):
                agg_hits += 1
            else:
                hits.append(f"CAST({inner[:60]} AS {ttype})")
    return hits, agg_hits


def lint_output(out_dir, name):
    """Rule B: flag DECIMAL columns in the hashed result schema."""
    try:
        import duckdb
    except ImportError:
        return None
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    rel = con.sql(f"DESCRIBE SELECT * FROM read_parquet('{files[0]}')")
    return [f"{c} :: {t}" for c, t, *_ in rel.fetchall()
            if str(t).upper().startswith("DECIMAL")]


def main(out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = 0
    n_agg = 0
    for name, sql in sorted(oracle.items()):
        a, agg = lint_sql(name, sql)
        n_agg += agg
        if a:
            if name in WAIVED_A:
                print(f"WAIVED-A {name}: [{WAIVED_A[name]}]")
            else:
                bad += 1
                print(f"FLAG-A {name}: per-row cross-engine "
                      f"double->decimal derivation — make it "
                      f"exact-by-construction")
                for h in a:
                    print(f"        {h}")
        b = lint_output(out_dir, name)
        if b:
            if name in WAIVED_B:
                print(f"WAIVED-B {name}: [{WAIVED_B[name]}]")
            else:
                bad += 1
                print(f"FLAG-B {name}: DECIMAL column(s) in hashed "
                      f"output — render to VARCHAR or DOUBLE first")
                for h in b:
                    print(f"        {h}")
    print(f"\noraclelint: {bad} unwaived finding(s) over "
          f"{len(oracle)} declared queries "
          f"({n_agg} mirrored-aggregate casts exempted by shape)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
