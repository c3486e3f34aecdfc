"""Run the driver's correctness gate at an arbitrary sf dir (VERDICT r3
directive #6: "push one scale knob the sandbox allows" — the driver only
compares at sf0.01; plan cliffs like broadcast thresholds, skyline
metadata volume, and fuzzy candidate counts only show up at larger data).

Mirrors the driver's compare exactly (same canonical form as
tests/test_driver_contract.py): for every __spark_entry__.queries() entry
with an oracle_sql() twin, run the Spark query and the DuckDB SQL over
the same parquet tables and record rows / schema (column names + type
classes) / order-insensitive value match; entries without an oracle get
the weaker rows-only check. Prints one JSON object and writes it to
--out (default CORRECTNESS_sf{sf}.json at the repo root).

Usage:
    python scripts/correctness_sf.py [--sf-dir /root/testdata/sf0.1]
        [--out CORRECTNESS_sf0.1.json] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_SPARK_CANON = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float", "float": "float", "string": "str", "date": "date",
    "boolean": "bool",
}
_DUCK_CANON = {
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int", "TINYINT": "int",
    "HUGEINT": "int128", "UBIGINT": "uint64",
    "DOUBLE": "float", "FLOAT": "float", "VARCHAR": "str", "DATE": "date",
    "BOOLEAN": "bool",
}


def _canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name subset")
    ap.add_argument("--merge", action="store_true",
                    help="update only --only rows in an existing --out "
                         "file (recomputing the summary) instead of "
                         "overwriting it with the subset")
    args = ap.parse_args()

    sf = args.sf_dir.rstrip("/").split("sf")[-1]
    out_path = args.out or os.path.join(REPO, f"CORRECTNESS_sf{sf}.json")

    import duckdb

    import __spark_entry__ as entrymod
    from research_engine_spark.session import get_spark

    spark = get_spark(app_name=f"correctness_sf{sf}", cores=args.cores,
                      shuffle_partitions=max(args.cores, 16),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    # Big-corpus oracles (the recursive clustering CTE, the shingle
    # self-join) spill multi-GB temp files; keep DuckDB's spill on the
    # roomiest scratch available instead of the repo cwd's filesystem,
    # where it shares the disk with Spark's own local dirs.
    duck_tmp = os.path.join(
        "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp",
        "duckdb_spill")
    os.makedirs(duck_tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{duck_tmp}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{args.sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(queries)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    results: dict[str, dict] = {}
    for name in names:
        # spark_sec / oracle_sec split (VERDICT r5 #3): `sec` wrapped
        # Spark + the DuckDB oracle together, so a slow oracle twin
        # (recursive CTEs, regex recompute) could hide — or fake — an
        # engine regression at scale. Both sides now carry their own
        # wall time; `sec` stays as the total for continuity.
        rec: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None, "sec": None,
                     "spark_sec": None, "oracle_sec": None}
        t0 = time.monotonic()
        try:
            sdf = queries[name](spark, args.sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_sec"] = round(time.monotonic() - t0, 3)
            rec["spark_rows"] = len(srows)
            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                t_o = time.monotonic()
                ores = con.execute(oracles[name])
                orows = ores.fetchall()
                rec["oracle_sec"] = round(time.monotonic() - t_o, 3)
                ocols = [d[0] for d in ores.description]
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                stypes = {c: _SPARK_CANON.get(dt) for c, dt in sdf.dtypes}
                rel = con.sql(oracles[name])
                otypes = {c: _DUCK_CANON.get(str(t))
                          for c, t in zip(rel.columns, rel.types)}
                rec["schema_match"] = sorted(sdf.columns) == sorted(ocols) \
                    and all(stypes.get(c) == otypes.get(c)
                            for c in sdf.columns
                            if stypes.get(c) and otypes.get(c))
                rec["hash_match"] = (
                    rec["rows_match"] and rec["schema_match"]
                    and _canon(srows, sdf.columns) == _canon(orows, ocols))
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        rec["sec"] = round(time.monotonic() - t0, 3)
        results[name] = rec
        ok = rec["hash_match"] if rec["err"] is None else rec["err"]
        print(f"  {name}: {ok} ({rec['sec']}s)", file=sys.stderr, flush=True)

    if args.merge and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)["results"]
        prior.update(results)
        results = prior

    n_green = sum(1 for r in results.values() if r["hash_match"])
    n_err = sum(1 for r in results.values()
                if r["err"] not in (None, "no_oracle"))
    summary = {"sf_dir": args.sf_dir, "n_queries": len(results),
               "n_hash_green": n_green, "n_rows_only": sum(
                   1 for r in results.values() if r["err"] == "no_oracle"),
               "n_err": n_err}
    payload = {"summary": summary, "results": results}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
