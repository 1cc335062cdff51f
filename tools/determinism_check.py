#!/usr/bin/env python3
"""Determinism gate: two full graft.Verify runs must produce identical
query outputs.

Usage: python3 tools/determinism_check.py [sfDir]
       python3 tools/determinism_check.py --compare <dirA> <dirB>

Default mode runs `sbt runMain graft.Verify` twice into fresh temp dirs
(separate JVMs, separate SparkSessions) and compares every query's
parquet output content-wise: rows are canonicalized through DuckDB
(`row::VARCHAR`, which renders nested lists/structs too), sorted, and
the whole result md5'd — so file count, file naming, row order and
encoding details don't matter, VALUES do. Any hash mismatch is a
nondeterminism bug (unstable sort tiebreak, time-dependent expression,
iteration-order leak).

--compare skips the Verify runs and just diffs two existing dump dirs.
"""
import hashlib
import os
import subprocess
import sys
import tempfile

import duckdb


def run_verify(sf_dir, out_dir, rebuild_artifacts=False):
    """rebuild_artifacts=True forces the ArtifactStore to rebuild every
    shared serve artifact from scratch (SPARK_GRAFT_ARTIFACT_REBUILD=1):
    run B uses it so this gate keeps testing BUILD determinism, not just
    that two JVMs can read the same parquet — the build path is where the
    r7 rank-tie instability lived."""
    env = dict(os.environ)
    if rebuild_artifacts:
        env["SPARK_GRAFT_ARTIFACT_REBUILD"] = "1"
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=env)


def content_hash(con, parquet_glob):
    """Order-insensitive content hash of a parquet result set."""
    rows = con.execute(
        f"SELECT t::VARCHAR AS r FROM read_parquet('{parquet_glob}') t "
        "ORDER BY r").fetchall()
    h = hashlib.md5()
    for (r,) in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows)


def compare_dirs(a, b):
    con = duckdb.connect()
    names_a = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    names_b = sorted(d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d)))
    if names_a != names_b:
        print(f"FAIL: query sets differ: {set(names_a) ^ set(names_b)}")
        return 1
    n_fail = 0
    for name in names_a:
        ha, na = content_hash(con, f"{a}/{name}/*.parquet")
        hb, nb = content_hash(con, f"{b}/{name}/*.parquet")
        if ha != hb:
            n_fail += 1
            print(f"FAIL {name}: run1 {na} rows {ha} != run2 {nb} rows {hb}")
        else:
            print(f"PASS {name} ({na} rows, {ha[:12]})")
    print(f"\n{len(names_a) - n_fail} deterministic, {n_fail} mismatched, "
          f"{len(names_a)} total")
    return 1 if n_fail else 0


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--compare":
        sys.exit(compare_dirs(sys.argv[2], sys.argv[3]))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    a = tempfile.mkdtemp(prefix="graft_det_a_")
    b = tempfile.mkdtemp(prefix="graft_det_b_")
    print(f"run 1 -> {a}")
    run_verify(sf_dir, a)
    print(f"run 2 (fresh artifact rebuild) -> {b}")
    run_verify(sf_dir, b, rebuild_artifacts=True)
    sys.exit(compare_dirs(a, b))


if __name__ == "__main__":
    main()
