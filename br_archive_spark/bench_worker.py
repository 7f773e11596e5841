"""Subprocess bench worker: one (master, job) measurement per JVM.

Spark can't change ``master`` after the JVM starts, so each parallelism
level runs in its own process; ``bench.py`` orchestrates and compares.

Measurement discipline for the N→4N scaling evidence:

* **Pinned split planning.** ``maxPartitionBytes`` ==
  ``openCostInBytes`` pins ``maxSplitBytes`` to a constant — otherwise
  Spark's ``bytesPerCore`` term makes splits (and thus chunk
  boundaries and task counts) depend on core count, and the two runs
  would encode different plans.
* **Warm Python workers.** A no-op mapInArrow pass spawns and warms the
  Arrow workers (imports, JIT) before the timer starts, so the measured
  region is the encode computation, not process spawn.
* **End-to-end job.** The timed job is encode + durable manifest write
  (the in-process sink of ``encode_files``), the like-for-like analog
  of the reference's ``bra -c`` which also persists its archive; the
  driver-side action only aggregates payload-free stats rows.

Prints one JSON line with timings and manifest totals.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

_SCAN_CONF = {
    # pinned and small: split planning must not depend on core count,
    # and ~4 waves of tasks per core smooth the straggler tail
    "spark.sql.files.maxPartitionBytes": "4m",
    "spark.sql.files.openCostInBytes": "4m",
    "spark.ui.enabled": "false",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument("--generate-only", action="store_true")
    ap.add_argument("--write", action="store_true",
                    help="also measure encode→parquet sink time")
    ap.add_argument("--trials", type=int, default=2,
                    help="warm trials after the cold pass")
    args = ap.parse_args()

    import pyarrow  # noqa: F401  (fail fast if missing)
    from pyspark.sql import functions as F

    from br_archive_spark.datagen import token_table
    from br_archive_spark.plans import get_spark

    spark = get_spark(f"local[{args.cpus}]",
                      app_name=f"bra-bench-{args.cpus}",
                      shuffle_partitions=args.parts,
                      extra_conf=_SCAN_CONF)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    if not os.path.exists(args.input):
        token_table(spark, args.docs).write.parquet(args.input)
    t_gen = time.time() - t0
    if args.generate_only:
        print(json.dumps({"t_gen": round(t_gen, 3)}))
        spark.stop()
        return

    # warm the Arrow Python workers (one per core) before timing
    def _noop(it):
        import numpy  # noqa: F401
        for b in it:
            yield b

    (spark.range(0, args.cpus * 2, 1, args.cpus * 2)
     .mapInArrow(_noop, "id long").count())

    from br_archive_spark.operators import encode_files

    # 1 cold + N warm trials; report the BEST warm pass — the standard
    # scaling-study estimator, since local-mode noise (GC, page cache,
    # background daemons) only ever adds time. The timed job is the
    # FULL bulk path: encode_files with an in-process sink — tasks read
    # parquet splits with pyarrow, encode, and write their manifest
    # shards directly, so payload bytes cross zero process boundaries
    # end-to-end (the reference's `bra -c` also persists its archive —
    # this is the like-for-like job). (path, row-group) work units and
    # shard names are pure functions of the input layout, so both
    # parallelism levels execute the identical unit list.
    trials = []
    stats = None
    for _ in range(1 + args.trials):
        shutil.rmtree(args.output, ignore_errors=True)
        t1 = time.time()
        # explicit bucket budget: the auto target depends on core count
        # (waves heuristic), and the two scaling levels must execute the
        # IDENTICAL work-unit list
        # SPARK_GRAFT_UB overrides the bucket budget for sweeps; the
        # default 48 MB gives ~4.7 waves at 16 cores on the bench input
        ub = int(os.environ.get("SPARK_GRAFT_UB", 48 << 20))
        enc = encode_files(spark, args.input,
                           target_unit_bytes=ub,
                           output_dir=args.output)
        stats = enc.agg(F.sum("n_values"), F.sum("enc_bytes"),
                        F.sum("orig_bytes"), F.count("*")).collect()[0]
        trials.append(time.time() - t1)
    t_encode = min(trials[1:])

    result = {
        "t_gen": round(t_gen, 3),
        "t_encode": round(t_encode, 3),
        "t_cold": round(trials[0], 3),
        "trials": [round(t, 3) for t in trials],
        "tokens": int(stats[0]),
        "enc_bytes": int(stats[1]),
        "orig_bytes": int(stats[2]),
        "chunks": int(stats[3]),
    }
    if args.write:
        # decode throughput (reference baseline: 7.7 Mtok/s, unbra -t —
        # full decode + checksum verify, no output written): bulk-path
        # decode_files reads manifest shards in-process
        from br_archive_spark.operators import decode_files

        dec_trials = []
        for _ in range(2):
            t3 = time.time()
            dec_tokens = decode_files(spark, args.output).agg(
                F.sum(F.size("tokens"))).collect()[0][0]
            dec_trials.append(time.time() - t3)
        # best-of like the encode side: the first pass pays the
        # decode UDF's worker/codegen warmup
        result["t_decode"] = round(min(dec_trials), 3)
        result["decode_trials"] = [round(t, 3) for t in dec_trials]
        result["decode_tokens"] = int(dec_tokens)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
