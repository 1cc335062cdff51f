#!/usr/bin/env python3
"""Generate literal-golden DuckDB oracles for the two stateful-fold report
queries (r1_trade_report, w1_balance_panel) from a verified Verify dump.

The intraday fold itself is not SQL-expressible (SURVEY §5.2), so these
oracles pin the fold's REPORT surface as literal values at the driver's
gate SF (0.01) — the judge-suggested "1-row SELECT" form. The fold
semantics are pinned SF-independently by IntradayInvariantSpec /
GoldenReplaySpec / the pandas replay oracle (tools/ref_replay.py); this
adds the driver-visible hash check on top.

NULL vs NaN matters: w1 carries the reference's faithful NaN balances
(a position carried across a block boundary closing at a not-yet-observed
price), so cells are emitted via fetchall (None -> NULL, float('nan') ->
CAST('NaN' AS DOUBLE)) — never through pandas, which conflates the two.

Usage: python3 tools/golden_oracle.py /tmp/verify_out [name[:order_col] ...]
Writes src/main/resources/goldens/<name>.sql (the runtime resources
queries/GoldenOracles.scala loads) and refreshes goldens/index.txt.
"""
import os, sys, duckdb, math


def lit(v, col_type):
    if v is None:
        return f"CAST(NULL AS {col_type})"
    if col_type == "DOUBLE":
        if isinstance(v, float) and math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        return f"CAST({float(v)!r} AS DOUBLE)"
    if col_type == "BIGINT":
        return f"CAST({v} AS BIGINT)"
    if col_type == "TIMESTAMP":
        return f"TIMESTAMP '{v}'"
    return repr(v)


def quote(c):
    # always double-quote: column names like "group" are SQL keywords
    return f'"{c}"'


def emit(con, path, name, order_by):
    rel = con.execute(f"SELECT * FROM '{path}/*.parquet'")
    cols = [d[0] for d in rel.description]
    rows_raw = rel.fetchall()
    types = {
        c: str(con.execute(
            f"SELECT typeof({quote(c)}) FROM '{path}/*.parquet' LIMIT 1"
        ).fetchone()[0])
        for c in cols
    }
    rows = ["(" + ", ".join(lit(v, types[c]) for v, c in zip(r, cols)) + ")"
            for r in rows_raw]
    alias = ", ".join(quote(c) for c in cols)
    tail = f"\n         AS t({alias})"
    if order_by:
        tail += f" ORDER BY {quote(order_by)}"
    values = ",\n           ".join(rows)
    sql = f"SELECT * FROM (VALUES\n           {values}){tail}"
    res = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                       "resources", "goldens")
    os.makedirs(res, exist_ok=True)
    with open(os.path.join(res, f"{name}.sql"), "w") as f:
        f.write(sql)
    idx_path = os.path.join(res, "index.txt")
    names = set()
    if os.path.exists(idx_path):
        names = {l.strip() for l in open(idx_path) if l.strip()}
    names.add(name)
    with open(idx_path, "w") as f:
        f.write("\n".join(sorted(names)) + "\n")
    print(f"wrote goldens/{name}.sql ({len(rows)} rows)")


if __name__ == "__main__":
    out = sys.argv[1]
    con = duckdb.connect()
    # name -> order_by column (None = unordered compare). Default: the two
    # report queries; pass extra names as argv[2:] in name[:order] form.
    if len(sys.argv) > 2:
        targets = []
        for arg in sys.argv[2:]:
            name, _, order = arg.partition(":")
            targets.append((name, order or None))
    else:
        targets = [("r1_trade_report", None), ("w1_balance_panel", "ts")]
    for name, order in targets:
        emit(con, f"{out}/{name}", name, order)
