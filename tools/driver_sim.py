"""Driver simulation: run every contract query vs its DuckDB oracle."""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    builder = SparkSession.builder.master(
        os.environ.get("SIM_MASTER", "local[8]")
    )
    # the real driver runs default memory at sf0.01; larger probe
    # corpora (SCALING.md's /tmp/scale10) need a bigger driver JVM
    mem = os.environ.get("SIM_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    import __spark_entry__ as contract

    from aw3d30_parquet_spark.oracle import canonical_hash

    res = contract.entry(spark)
    rows = res.collect()
    print(f"entry: {len(rows)} rows, schema={res.schema.simpleString()}")
    assert len(rows) >= 1

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = contract.queries()
    oracles = contract.oracle_sql()
    declared = set(contract.rows_only())
    actual = set(qs) - set(oracles)
    if actual != declared:
        print(
            "ROWS_ONLY registry inconsistent: "
            f"undeclared={sorted(actual - declared)} "
            f"stale={sorted(declared - actual)}"
        )
        return 1
    # SIM_ONLY="l01,d04" (full names or 3-char codes): check just those
    # queries against their oracles — cheap targeted re-verification
    # after touching one operator, instead of a 170-query pass.
    only = os.environ.get("SIM_ONLY", "").strip()
    if only:
        wanted = {w.strip() for w in only.split(",") if w.strip()}
        qs = {n: f for n, f in qs.items() if n in wanted or n[:3] in wanted}
        if not qs:
            print(f"SIM_ONLY matched no queries: {only!r}")
            return 1
    n_fail = 0
    n_ok = 0
    n_rows_only = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            if name in oracles:
                res_o = con.execute(oracles[name])
                h_s = canonical_hash(sdf.toPandas())
                h_o = canonical_hash(res_o.df())
                ok = h_s == h_o
                if ok:
                    n_ok += 1
                else:
                    n_fail += 1
                    print(f"FAIL {name}: {h_s} != {h_o}")
            else:
                cnt = sdf.count()
                n_rows_only += 1
                if cnt < 0:
                    n_fail += 1
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}")
        dt = time.time() - t0
        if dt > 5:
            print(f"  slow: {name} {dt:.1f}s")
    print(
        f"total={len(qs)} oracle_ok={n_ok} rows_only={n_rows_only} "
        f"fail={n_fail}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
