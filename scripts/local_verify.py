#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against its DuckDB oracle from oracle_sql.json.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# Types DuckDB can produce that Spark parquet never will; a value-equal
# result with one of these still hash-mismatches in the driver (its hash is
# type-sensitive). sum(BIGINT) silently widening to HUGEINT is the classic
# case (q74, round 5) — always wrap the outer CAST(... AS BIGINT).
BANNED_ORACLE_TYPES = {"HUGEINT", "UHUGEINT"}
BANNED_ORACLE_PREFIXES = ("DECIMAL",)


# Aggregates whose RESULT VALUE depends on input order: an ORDER BY inside
# one must pin NULL placement explicitly on EVERY sort key. Spark orders
# NULLS FIRST on ASC / NULLS LAST on DESC; DuckDB defaults to the opposite
# (NULLS LAST on ASC) — a value-equal-looking oracle silently diverges the
# moment a NULL reaches the sort key (same failure class as the q74 type
# drift: hash-different while eyeballing equal).
ORDER_SENSITIVE_AGGS = ("string_agg", "array_agg", "list", "group_concat",
                        "first", "last")


def _call_spans(sql_lower, fn):
    """Yield the argument text of each `fn(...)` call (paren-balanced)."""
    start = 0
    while True:
        i = sql_lower.find(fn + "(", start)
        if i < 0:
            return
        # must be a function name, not a suffix of a longer identifier
        if i > 0 and (sql_lower[i - 1].isalnum() or sql_lower[i - 1] == "_"):
            start = i + len(fn)
            continue
        j = i + len(fn) + 1
        depth = 1
        while j < len(sql_lower) and depth:
            if sql_lower[j] == "(":
                depth += 1
            elif sql_lower[j] == ")":
                depth -= 1
            j += 1
        yield sql_lower[i + len(fn) + 1:j - 1]
        start = j


def _split_top_level(text, sep=","):
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def null_order_problems(name, sql):
    """Lint ORDER BY clauses inside order-sensitive aggregate calls: every
    sort key must carry an explicit NULLS FIRST/LAST."""
    problems = []
    low = sql.lower()
    for fn in ORDER_SENSITIVE_AGGS:
        for args in _call_spans(low, fn):
            k = args.find("order by")
            if k < 0:
                continue
            for key in _split_top_level(args[k + len("order by"):]):
                if "nulls first" not in key and "nulls last" not in key:
                    problems.append(
                        f"{fn}(... ORDER BY {key.strip()[:40]}) lacks an explicit "
                        f"NULLS FIRST/LAST (Spark and DuckDB default opposite)")
    return problems


def type_problems(name, cols, types, spark_types):
    """Lint oracle column types against the Spark parquet's (both DuckDB-typed,
    matched by column name). Returns a list of human-readable problems."""
    spark_by_col = dict(zip(*spark_types)) if spark_types else {}
    problems = []
    for c, t in zip(cols, types):
        tn = str(t).upper()
        if tn in BANNED_ORACLE_TYPES or tn.startswith(BANNED_ORACLE_PREFIXES):
            problems.append(f"oracle column {c} has banned type {tn} "
                            f"(wrap an outer CAST)")
        st = spark_by_col.get(c)
        if st is not None and str(st).upper() != tn:
            problems.append(f"type mismatch on {c}: oracle {tn} vs spark {st}")
    return problems


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(round(v, 9) if isinstance(v, float) else v
                         for v in (r[i] for i in order)))
    out.sort(key=repr)
    return out


def escaped_class_problems(name, sql):
    """Lint regex character classes for a DOUBLE-backslashed escape: inside
    the repo's triple-quoted Scala oracle strings, '\\\\x00' reaches the
    engine as backslash + 'x00' — a class matching backslash/x/digits
    instead of control chars, silently inverting blank guards (shipped
    once; see the q21-family fix). The canonical form is single-backslash."""
    if "\\\\x" in sql:
        return [f"double-backslashed \\\\x escape in a regex class "
                f"(use the single-backslash '[\\x00-\\x20]' convention)"]
    return []


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        unknown = only - set(oracle)
        if unknown:  # a typo'd filter must not report a false green
            print(f"FAIL <filter>: unknown query name(s): {sorted(unknown)}")
            return 1
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [c.lower() for c in got_rel.columns]
            got = normalize(got_rel.fetchall(), got_cols)
            want_rel = con.sql(sql)
            want_cols = [c.lower() for c in want_rel.columns]
            want = normalize(want_rel.fetchall(), want_cols)
            lint = (type_problems(name, want_cols, want_rel.types,
                                  (got_cols, got_rel.types))
                    + null_order_problems(name, sql)
                    + escaped_class_problems(name, sql))
            if sorted(got_cols) != sorted(want_cols):
                print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
                n_fail += 1
            elif lint:
                print(f"FAIL {name}: " + "; ".join(lint))
                n_fail += 1
            elif got != want:
                print(f"FAIL {name}: {len(got)} rows vs {len(want)} rows; "
                      f"first diff: {next(((a, b) for a, b in zip(got, want) if a != b), ('<len>', '<len>'))}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


def selftest():
    """The lints must catch their deliberately-broken exemplars."""
    bad = "SELECT k, string_agg(v, ',' ORDER BY ts DESC, eid) AS path FROM t GROUP BY k"
    good = ("SELECT k, string_agg(v, ',' ORDER BY ts DESC NULLS LAST, "
            "eid NULLS FIRST) AS path FROM t GROUP BY k")
    assert len(null_order_problems("bad", bad)) == 2, null_order_problems("bad", bad)
    assert null_order_problems("good", good) == []
    assert null_order_problems("nested", "SELECT list(x ORDER BY f(a, b), c) FROM t") and \
        len(null_order_problems("nested", "SELECT list(x ORDER BY f(a, b), c) FROM t")) == 2
    assert null_order_problems("noob", "SELECT list(x) FROM t") == []
    assert type_problems("t", ["n"], ["HUGEINT"], None)
    assert escaped_class_problems("esc", "regexp_replace(text, '^[\\\\x00-\\\\x20]+', '')")
    assert escaped_class_problems("ok", "regexp_replace(text, '^[\\x00-\\x20]+', '')") == []
    print("selftest OK")
    return 0


if __name__ == "__main__":
    if sys.argv[1:2] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
