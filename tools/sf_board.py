"""Full-board scale validation: run every ``queries()`` entry at two
scale factors and compare wall time + physical-plan shape.

VERDICT r4 next-steps #5: the plan locks run at sf0.01 — this script
is the evidence that no plan flips super-linear at 10x the bench
scale (AQE may change join strategies at runtime). For each query it
records, at BOTH sf dirs:

* wall seconds for a full materialization (``noop`` sink — executes
  the whole plan, writes nothing),
* Exchange-node count and CartesianProduct presence in the final
  (AQE-resolved where available) physical plan.

A query passes the scale audit when t(sfB)/t(sfA) stays under the
ratio bound (default 12 for a 10x scale-up, slack for fixed costs)
and the sfB plan gains no CartesianProduct the sfA plan didn't have.

Usage:
    python tools/sf_board.py SF_A SF_B OUT_JSON [--only q1,q2,...]
"""

from __future__ import annotations

import json
import sys
import time


def _plan_shape(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    return {
        "exchanges": plan.count("Exchange"),
        "cartesian": ("CartesianProduct" in plan
                      or "BroadcastNestedLoopJoin" in plan),
    }


def main() -> None:
    sf_a, sf_b, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from br_archive_spark.plans import get_spark

    spark = get_spark("local[32]", app_name="sf-board",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # one throwaway action per sf dir: JVM/codegen warmup + parquet
    # footer cache, so the first board query isn't billed the cold start
    for d in (sf_a, sf_b):
        spark.read.parquet(f"{d}/lineitem.parquet").count()

    results: dict[str, dict] = {}
    qs = entry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {}
        for tag, sf_dir in (("a", sf_a), ("b", sf_b)):
            try:
                df = fn(spark, sf_dir)
                row.update({f"{k}_{tag}": v
                            for k, v in _plan_shape(df).items()})
                t0 = time.monotonic()
                df.write.mode("overwrite").format("noop").save()
                row[f"t_{tag}"] = round(time.monotonic() - t0, 3)
            except Exception as e:           # noqa: BLE001 - report
                row[f"err_{tag}"] = f"{type(e).__name__}: {e}"[:300]
        if "t_a" in row and "t_b" in row and row["t_a"] > 0:
            row["ratio"] = round(row["t_b"] / row["t_a"], 2)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    bad_ratio = {n: r["ratio"] for n, r in results.items()
                 if r.get("ratio", 0) > 12}
    new_cart = {n for n, r in results.items()
                if r.get("cartesian_b") and not r.get("cartesian_a")}
    errs = {n for n, r in results.items()
            if "err_a" in r or "err_b" in r}
    print(json.dumps({"n": len(results), "over_ratio": bad_ratio,
                      "new_cartesian": sorted(new_cart),
                      "errors": sorted(errs)}))
    spark.stop()


if __name__ == "__main__":
    main()
