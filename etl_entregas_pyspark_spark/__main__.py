"""CLI entry point — reference ``main.py`` parity (SURVEY §3.1):

    python -m etl_entregas_pyspark_spark [--env E] [--dry-run]
        [--show-config] [key=value ...]

Unrecognized ``key=value`` arguments are config dotlist overrides with
highest precedence (base < env overlay < CLI), e.g.::

    python -m etl_entregas_pyspark_spark --env develop \\
        paths.input_file=data/raw/entregas.csv \\
        paths.output_base=out/delivered filters.country=GT
"""

from __future__ import annotations

import argparse
import json
import sys

from etl_entregas_pyspark_spark.config import load_config, validate_date_range
from etl_entregas_pyspark_spark.operators.pipeline import EntregasPipeline
from etl_entregas_pyspark_spark.session import build_session


def parse_arguments(argv: list[str] | None = None) -> tuple[argparse.Namespace, list[str]]:
    parser = argparse.ArgumentParser(
        prog="etl_entregas_pyspark_spark",
        description="Config-driven entregas ETL on the PySpark-native engine",
    )
    parser.add_argument("--env", default=None, help="environment overlay (config_<env>.yaml)")
    parser.add_argument("--config", default=None, help="base config file (yaml/json)")
    parser.add_argument("--dry-run", action="store_true", help="build the plan, skip the write")
    parser.add_argument("--show-config", action="store_true", help="print effective config and exit")
    args, extra = parser.parse_known_args(argv)
    bad = [e for e in extra if "=" not in e]
    if bad:
        parser.error(f"unrecognized arguments (expected key=value overrides): {bad}")
    return args, extra


def main(argv: list[str] | None = None) -> int:
    args, dotlist = parse_arguments(argv)
    config = load_config(base=args.config, env=args.env, dotlist=dotlist)

    if args.show_config:
        print(json.dumps(config, indent=2, ensure_ascii=False, default=str))
        return 0

    filters = config.get("filters", {})
    validate_date_range(str(filters.get("start_date")), str(filters.get("end_date")))

    spark = build_session(config)
    try:
        metrics = EntregasPipeline(spark, config).run(write=not args.dry_run)
    finally:
        spark.stop()
    print(json.dumps(metrics, indent=2, ensure_ascii=False, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
