"""spark-submit entry point: build the knowledge graph.

    spark-submit --py-files kg.zip jobs/build_kg.py \
        --sf-dir /root/testdata/sf0.001 --warehouse /tmp/kgwh --run-id r1

On a real cluster `--table` points at the Iceberg raw_files corpus instead
of --sf-dir (which synthesizes the deterministic test corpus locally).
Prints one JSON line with stage rows/wall-times and triples/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Allow `python jobs/build_kg.py` without --py-files / PYTHONPATH.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Build the Confluence knowledge graph")
    ap.add_argument("--sf-dir", help="testdata dir to synthesize the corpus from")
    ap.add_argument("--table", help="existing raw_files table path (parquet/Iceberg)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--master", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument(
        "--replicate",
        type=int,
        default=1,
        help="tile the synthesized corpus N times (scaling benchmarks)",
    )
    ap.add_argument(
        "--dry-run",
        action="store_true",
        help="compute + count every stage, write nothing (A6 semantics)",
    )
    args = ap.parse_args(argv)
    if not args.sf_dir and not args.table:
        ap.error("one of --sf-dir or --table is required")

    from confluence2md_spark.plans.pipeline import build_kg
    from confluence2md_spark.session import get_spark
    from confluence2md_spark.sources.corpus import synth_raw_files

    spark = get_spark(app_name=f"kg-build-{args.run_id}", master=args.master)
    try:
        if args.table:
            raw = spark.read.parquet(args.table)
        else:
            raw = synth_raw_files(spark, args.sf_dir, replicate=args.replicate)
        res = build_kg(
            spark,
            raw,
            args.warehouse,
            run_id=args.run_id,
            num_partitions=args.partitions,
            dry_run=args.dry_run,
        )
        n_triples = res.stage_rows.get("edges", 0)
        wall = res.total_wall_s
        print(
            json.dumps(
                {
                    "run_id": res.run_id,
                    "stage_rows": res.stage_rows,
                    "stage_wall_s": {k: round(v, 2) for k, v in res.stage_wall_s.items()},
                    "resumed_stages": res.resumed_stages,
                    "triples": n_triples,
                    "wall_s": round(wall, 2),
                    "triples_per_sec": round(n_triples / wall, 1) if wall > 0 else None,
                }
            )
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
