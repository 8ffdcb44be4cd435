"""Two-parallelism scaling-efficiency evidence (north rule).

The rule requires the same job at N and 4N executors with ≥0.8
throughput-scaling efficiency. No real cluster exists in this sandbox,
so per the driver's instruction the evidence is the same job at two
parallelism levels: the process (and every Spark task + Python worker
it forks) is pinned to N CPUs via sched_setaffinity, with master
local[N] — so "cluster size" is a real CPU budget, not just a thread
count (chained Arrow-UDF stages run Python workers outside the JVM
thread pool; without pinning, local[8] silently uses far more than 8
CPUs and the comparison is meaningless).

Method: the pages table is materialized to parquet ONCE (setup,
untimed — the in-sandbox stand-in for the north rule's Iceberg pages
table), then each pinned child runs the real job — column-pruned
(url, text) parquet scan → extract (mapInPandas) → cell-cover
broadcast spatial join + PIP — `count()` ITERS times; per-iteration
throughput is reported and the best iteration is used for the
efficiency ratio (the host is shared/noisy; best-of-N approximates
uncontended steady state; iteration 0 additionally pays one-time
Python worker spawn + JIT, which a long-running cluster job
amortizes). `--rounds K` switches to PAIRED mode: K low/high
back-to-back rounds so both levels sample the same time-correlated
host-noise regime, reporting per-round efficiencies and the median.

Usage: python tools/scaling_bench.py [--pages 10000000] [--low 2]
           [--high 8] [--iters 3] [--rounds 5] [--no-fixture]
Prints one JSON line; paste the result into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.sched_setaffinity(0, set(range({cores})))
from gdal_spark import testdata
from gdal_spark.session import get_spark
from gdal_spark.operators.extract import extract_features
from gdal_spark.operators.spatial_join import spatial_join

spark = get_spark(app_name="scale{cores}", cores={cores})
if {fixture!r}:
    # the north-rule job proper: a real (url, text) Parquet/Iceberg
    # scan — column-pruned, JVM-side decode — into the pipeline; the
    # Python synthetic generator never sits inside the measurement.
    # 32 files give every level enough scan tasks; no repartition (a
    # real job would never shuffle the input table just to read it)
    pages = spark.read.parquet({fixture!r})
else:
    # columns=["text"] emulates Parquet/Iceberg column pruning: the join
    # only reads (url, text); a real scan would never materialize html
    pages = testdata.pages_df(
        spark, {pages}, partitions={parts}, columns=["text"]
    )
j = spatial_join(
    extract_features(pages), testdata.polygons_pdf(100), res_min=2, res_max=7
)
iters = []
rows = 0
for it in range({iters}):
    t0 = time.perf_counter()
    rows = j.count()
    iters.append(round(time.perf_counter() - t0, 2))
print(json.dumps({{"cores": {cores}, "iters": iters, "rows": rows}}))
"""

_FIXTURE_WRITER = """
import os, sys
sys.path.insert(0, {repo!r})
from gdal_spark import testdata
from gdal_spark.session import get_spark

spark = get_spark(app_name="scale_fixture")
(testdata.pages_df(spark, {pages}, partitions=32, columns=["text"])
 .write.mode("overwrite").parquet({fixture!r}))
print("fixture written")
"""


def ensure_fixture(pages: int) -> str:
    """Materialize the synthetic pages table as parquet ONCE (setup,
    untimed, unpinned) so every measured child runs the real job: a
    column-pruned parquet scan of (url, text) — the in-sandbox stand-in
    for the north rule's Iceberg pages table."""
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(), f"gdal_spark_scale_pages_{pages}.parquet"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c",
             _FIXTURE_WRITER.format(repo=REPO, pages=pages, fixture=path)],
            capture_output=True, text=True, check=True,
        )
    return path


def run_one(cores: int, pages: int, iters: int,
            fixture: str = "") -> dict:
    code = _CHILD.format(
        repo=REPO, cores=cores, pages=pages, parts=2 * cores,
        iters=iters, fixture=fixture,
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_paired(args) -> int:
    """Paired rounds: each round runs the low-core child then the
    high-core child back-to-back, so both levels sample the SAME host
    noise regime — the shared box's contention is time-correlated, and
    unpaired sampling lets a quiet 2-core window meet a noisy 8-core
    window (or vice versa), distorting the ratio both ways. Per-round
    efficiency + the median across rounds is the robust readout."""
    rounds = []
    t0 = time.perf_counter()
    fixture = "" if args.no_fixture else ensure_fixture(args.pages)
    for r in range(args.rounds):
        lo = run_one(args.low, args.pages, args.iters, fixture)
        hi = run_one(args.high, args.pages, args.iters, fixture)
        best_lo, best_hi = min(lo["iters"]), min(hi["iters"])
        eff = (best_lo / best_hi) / (args.high / args.low)
        rounds.append(
            {
                "low_iters_s": lo["iters"],
                "high_iters_s": hi["iters"],
                "best_low_s": best_lo,
                "best_high_s": best_hi,
                "efficiency": round(eff, 3),
            }
        )
        print(f"# round {r}: eff={eff:.3f} lo={best_lo} hi={best_hi}",
              file=sys.stderr)
    effs = sorted(x["efficiency"] for x in rounds)
    med = effs[len(effs) // 2] if len(effs) % 2 else (
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    )
    best = max(rounds, key=lambda x: x["efficiency"])
    print(
        json.dumps(
            {
                "pages": args.pages,
                "mode": "paired",
                "low_cores": args.low,
                "high_cores": args.high,
                "rounds": rounds,
                "median_efficiency": round(med, 3),
                "best_round": best,
                "low_pages_per_sec_best": round(
                    args.pages / min(x["best_low_s"] for x in rounds), 1
                ),
                "high_pages_per_sec_best": round(
                    args.pages / min(x["best_high_s"] for x in rounds), 1
                ),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
        )
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=0,
                    help="paired mode: N low/high back-to-back rounds")
    ap.add_argument("--no-fixture", action="store_true",
                    help="generate pages in-pipeline (pre-r03 method) "
                         "instead of scanning the parquet fixture")
    args = ap.parse_args()

    if args.rounds:
        return run_paired(args)

    t0 = time.perf_counter()
    fixture = "" if args.no_fixture else ensure_fixture(args.pages)
    hi = run_one(args.high, args.pages, args.iters, fixture)
    lo = run_one(args.low, args.pages, args.iters, fixture)
    best_lo = min(lo["iters"])
    best_hi = min(hi["iters"])
    speedup = best_lo / best_hi
    efficiency = speedup / (args.high / args.low)
    print(
        json.dumps(
            {
                "pages": args.pages,
                "rows_joined": hi["rows"],
                "low": {
                    "cores": args.low,
                    "iters_s": lo["iters"],
                    "best_s": best_lo,
                    "pages_per_sec": round(args.pages / best_lo, 1),
                },
                "high": {
                    "cores": args.high,
                    "iters_s": hi["iters"],
                    "best_s": best_hi,
                    "pages_per_sec": round(args.pages / best_hi, 1),
                },
                "speedup": round(speedup, 2),
                "scaling_efficiency": round(efficiency, 3),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
