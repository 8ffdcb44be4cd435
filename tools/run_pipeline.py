"""End-to-end north-rule pipeline job (spark-submit entry point).

pages (Common-Crawl-style, synthesized distributed & deterministically)
  → [--from-html] html → text via the byte-identity extraction kernel
  → extract geocoded features (mapInPandas, Arrow)
  → cell-cover broadcast spatial join + exact PIP
  → checkpointed bucket write with per-bucket lineage manifests
  → skew + stage metrics JSON on stdout (one line)

``--from-html`` runs the full input_hint path: the scan reads
(url, html) and the north-rule text column is PRODUCED by
``extract.extract_text`` instead of read; ``--check-extract`` then
proves the byte-identity invariant inside the same job (xxhash64 of
extracted vs stored text per url, mismatches must be 0).

Usage:
    python tools/run_pipeline.py --pages 200000 --cores 8 \
        --out /tmp/pipeline_out [--buckets 16] [--no-write]

Rerunning with the same --out resumes from the manifest (completed
buckets are skipped). On a real cluster this file is the
``spark-submit --py-files gdal_spark.zip tools/run_pipeline.py`` job;
here master is local[--cores], which is also how the two-cluster-size
scaling-efficiency evidence is produced (see BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=4)
    ap.add_argument("--no-write", action="store_true",
                    help="skip the checkpointed write (pure compute)")
    ap.add_argument("--skew-report", action="store_true",
                    help="emit per-key cell skew stats (extra pass)")
    ap.add_argument("--from-html", action="store_true",
                    help="scan (url, html) and extract text with the "
                         "byte-identity kernel (full input_hint path)")
    ap.add_argument("--check-extract", action="store_true",
                    help="with --from-html: verify extracted text is "
                         "byte-identical to the stored text per url")
    args = ap.parse_args()

    from gdal_spark import lineage, metrics, testdata
    from gdal_spark.operators.extract import extract_features, extract_text
    from gdal_spark.operators.spatial_join import spatial_join
    from gdal_spark.session import get_spark

    spark = get_spark(app_name="gdal_spark_pipeline", cores=args.cores)
    cores = int(spark.sparkContext.defaultParallelism)
    timer = metrics.StageTimer()
    t_all = time.perf_counter()

    result: dict = {}
    parts = max(cores * 2, 8)
    if args.from_html:
        pages = testdata.pages_df(
            spark, args.pages, partitions=parts, columns=["html"]
        )
        extracted = extract_text(pages).withColumnRenamed(
            "text_extracted", "text"
        )
        if args.check_extract:
            stored = testdata.pages_df(
                spark, args.pages, partitions=parts, columns=["text"]
            )
            with timer("check_extract"):
                mism = (
                    extracted.select(
                        "url", F.xxhash64("text").alias("h_ext")
                    )
                    .join(
                        stored.select(
                            "url", F.xxhash64("text").alias("h_store")
                        ),
                        "url",
                    )
                    .filter(F.col("h_ext") != F.col("h_store"))
                    .count()
                )
            if mism:
                print(
                    f"BYTE-IDENTITY VIOLATION: {mism} urls", file=sys.stderr
                )
                return 1
            result["extract_mismatches"] = 0
        features = extract_features(extracted)
    else:
        pages = testdata.pages_df(spark, args.pages, partitions=parts)
        features = extract_features(pages)
    polygons = testdata.polygons_pdf(100)
    joined = spatial_join(features, polygons, res_min=2, res_max=7)

    if args.no_write:
        with timer("join_count"):
            result["joined_rows"] = joined.count()
    else:
        out = args.out or "/tmp/gdal_spark_pipeline"
        with timer("checkpointed_write"):
            res = lineage.checkpointed_write(
                joined,
                out,
                F.pmod(F.xxhash64("url"), F.lit(args.buckets)),
                args.buckets,
                digest_cols=["url", "feat_id", "poly_id"],
                group_size=args.group_size,
            )
        result["joined_rows"] = sum(
            m["rows"] for m in res["manifest"].values()
        )
        result["buckets_written"] = len(res["written"])
        result["buckets_skipped"] = len(res["skipped"])
        result["out"] = out

    if args.skew_report:
        from gdal_spark.cells import cell_expr

        with timer("skew_report"):
            cells = features.select(
                cell_expr(F.col("lon"), F.col("lat"), 7).alias("cell_id")
            )
            result["cell_skew"] = metrics.key_skew(cells, ["cell_id"])

    wall = time.perf_counter() - t_all
    result.update(
        {
            "pages": args.pages,
            "cores": cores,
            "wall_s": round(wall, 3),
            "pages_per_sec": round(args.pages / wall, 1),
            "stages": timer.stages,
        }
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
