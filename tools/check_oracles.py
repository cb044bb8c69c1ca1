"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given SF, compare row count,
schema (column names), and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]

A FULL run (no query filter) additionally writes ``GATE_r{N}.json`` at the
repo root — per-query ok/fail + gate seconds + row count — so the judged
artifact chain can distinguish "driver truncated the record" from "never
ran": the driver's CORRECTNESS file caps at 50 entries/round, this one
always carries all of them.  N = 1 + the highest committed
CORRECTNESS_r*.json round (override path with PAPERONI_GATE_OUT).
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from paperoni_spark.pipeline import build_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 9)
    if isinstance(value, int):
        return int(value)
    return value


def rowset(cols, rows):
    """Canonicalize exactly like the driver gate: pandas DataFrame, columns
    sorted by name, then multi-column ``sort_values``.  Critically this
    REPRODUCES the driver's failure mode on unhashable cells (list-typed
    columns raise TypeError in pandas factorize) — round 1's
    media_resize_sample passed a repr-based local sort but broke the driver.
    """
    ordered = sorted(cols)
    df = pd.DataFrame(
        [[normalize(v) for v in r] for r in rows], columns=list(cols)
    )[ordered]
    if len(df):
        df = df.sort_values(by=ordered, kind="mergesort").reset_index(drop=True)
    return [tuple(r) for r in df.itertuples(index=False, name=None)], ordered


def gate_artifact_path(repo_root: str) -> str:
    env = os.environ.get("PAPERONI_GATE_OUT")
    if env:
        return env
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r0*(\d+)\.json$", p))
    ]
    n = (max(rounds) + 1) if rounds else 1
    return os.path.join(repo_root, f"GATE_r{n:02d}.json")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    record: dict[str, dict] = {}
    spark = build_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    t_total = time.monotonic()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t_q = time.monotonic()

        def done(ok: bool, detail: str, rows: int | None = None) -> None:
            secs = round(time.monotonic() - t_q, 2)
            record[name] = {"ok": ok, "detail": detail, "rows": rows, "sec": secs}
            tag = "ok  " if ok else "FAIL"
            print(f"{tag} {name}: {detail} [{secs:.1f}s]")

        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            done(False, f"spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            done(True, f"rows-only ({len(srows)} rows)", len(srows))
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:
            done(False, f"duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        s_set, s_cols = rowset(scols, [tuple(r) for r in srows])
        o_set, o_cols = rowset(ocols, orows)
        if s_cols != o_cols:
            done(False, f"columns {s_cols} vs {o_cols}")
            failures += 1
        elif len(s_set) != len(o_set):
            done(False, f"rowcount {len(s_set)} vs {len(o_set)}")
            failures += 1
        elif s_set != o_set:
            diff = [
                (a, b) for a, b in zip(s_set, o_set) if a != b
            ][:3]
            done(False, f"value mismatch, first diffs: {diff}")
            failures += 1
        else:
            done(True, f"{len(s_set)} rows match", len(s_set))
    total = round(time.monotonic() - t_total, 1)
    print(f"total gate wall: {total}s")
    if not only:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = gate_artifact_path(repo_root)
        # provenance stamp (round-6 verdict item: a working-tree re-run
        # must be distinguishable from the committed run without git
        # archaeology): HEAD sha + dirty flag + wall clock
        import subprocess

        def _git(*args):
            try:
                return (
                    subprocess.run(
                        ["git", *args], cwd=repo_root, capture_output=True
                    )
                    .stdout.decode()
                    .strip()
                )
            except Exception:  # noqa: BLE001 — provenance is best-effort
                return ""

        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "total_sec": total,
                    "n_queries": len(record),
                    "n_failures": failures,
                    "git_sha": _git("rev-parse", "HEAD"),
                    # the gate artifact itself is excluded: the previous
                    # run's (about-to-be-overwritten) file would mark
                    # every run dirty
                    "git_dirty": bool(
                        _git(
                            "status",
                            "--porcelain",
                            "--",
                            ".",
                            ":!GATE_r*.json",
                        )
                    ),
                    "run_utc": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                    "queries": record,
                },
                f,
                indent=1,
            )
        print(f"wrote {out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
