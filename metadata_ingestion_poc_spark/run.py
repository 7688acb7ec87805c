"""CLI entry point: ingest every enabled source from a YAML catalog.

Parity with the reference's run.py (run.py:25-56 in /root/reference),
minus its hardcoded cloud credentials (run.py:50-54 referenced an
undefined name; we take everything from the environment).

Usage:
    python -m metadata_ingestion_poc_spark.run --sources sources.yaml [--env local]
"""

from __future__ import annotations

import argparse

from .framework import run
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sources", required=True, help="path to sources YAML")
    parser.add_argument("--env", default="local")
    args = parser.parse_args(argv)

    spark = get_spark("ingestion-pipeline")
    try:
        ran = run(spark, args.sources, env=args.env)
        print(f"ingested {len(ran)} source(s): {', '.join(ran)}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
