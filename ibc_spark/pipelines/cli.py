"""spark-submit entry-point plumbing shared by the E1–E3 pipeline mains —
orchestration parity with the reference's ``workflow_dispatch`` jobs
(``.github/workflows/upload-staffing-roster.yml:20-65``): config via flags or
the same env vars (``WEB_APP_URL``/``SHEET_NAME``), one summary JSON line on
stdout (``staffing-roster-pipeline.py:303-304``), non-zero exit with
``Pipeline failed with error <code>`` on a taxonomy error.

Run shapes::

    spark-submit -m ibc_spark.pipelines.staffing_roster \
        --rows sheet.json --state-dir ./state --output ./out
    python -m ibc_spark.pipelines.projects --rows rows.json --output ./out
    python -m ibc_spark.pipelines.end_semester --state-dir ./state --output ./out

``--rows`` is a local JSON file (array of row objects — a captured sheet
payload); with ``--url`` (or env ``WEB_APP_URL``) rows are fetched over HTTP
through the S1/S2 boundary instead. State tables load from
``--state-dir/<table>.parquet`` when present, else start empty (first run).
"""

from __future__ import annotations

import argparse
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ibc_spark.errors import PipelineError
from ibc_spark.schemas import empty_state


def build_parser(prog: str, description: str, *, needs_rows: bool) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description=description)
    if needs_rows:
        src = p.add_mutually_exclusive_group()
        src.add_argument("--rows", help="local JSON file: array of sheet row objects")
        src.add_argument(
            "--url",
            default=os.environ.get("WEB_APP_URL"),
            help="sheet web-app URL (default: env WEB_APP_URL)",
        )
        p.add_argument(
            "--sheet-name",
            default=os.environ.get("SHEET_NAME"),
            help="sheet path param for --url fetch (default: env SHEET_NAME)",
        )
    p.add_argument("--state-dir", help="directory of <table>.parquet sink snapshots")
    p.add_argument("--output", help="directory to write result tables (parquet)")
    p.add_argument("--master", default=os.environ.get("SPARK_MASTER", "local[*]"))
    return p


def get_session(app: str, master: str) -> SparkSession:
    """One session factory for every entry point: reuse
    ``ibc_spark.session.get_spark`` so CLI runs get the same UTC timezone
    pin, AQE, and Arrow settings as the library/tests (a CLI-only builder
    here once silently dropped the UTC pin)."""
    from ibc_spark.session import get_spark

    return get_spark(app, master=master)


def load_rows(spark: SparkSession, args: argparse.Namespace) -> DataFrame:
    """Sheet rows from --rows file or the HTTP S1/S2 boundary."""
    from ibc_spark.errors import SheetReadError
    from ibc_spark.io_.sources import dataframe_from_rows, fetch_sheet_rows

    if args.rows:
        from ibc_spark.errors import InvalidFormatError

        try:
            with open(args.rows) as f:
                rows = json.load(f)
        except ValueError as e:
            raise InvalidFormatError(f"--rows file is not valid JSON: {e}") from e
        except OSError as e:
            raise SheetReadError(f"cannot read --rows file: {e}") from e
        if not isinstance(rows, list) or not all(isinstance(r, dict) for r in rows):
            raise InvalidFormatError("--rows file is not a JSON array of row objects")
    elif args.url:
        params = {"action": "read"}
        if args.sheet_name:
            params["path"] = args.sheet_name
        rows = fetch_sheet_rows(args.url, params=params)
    else:
        raise SheetReadError("no input: pass --rows FILE or --url/WEB_APP_URL")
    return dataframe_from_rows(spark, rows)


def load_state(
    spark: SparkSession, state_dir: str | None, table: str, schema: T.StructType
) -> DataFrame:
    path = os.path.join(state_dir, f"{table}.parquet") if state_dir else None
    if path and os.path.exists(path):
        return spark.read.parquet(path)
    return empty_state(spark, schema)


def write_outputs(output: str | None, tables: dict[str, DataFrame]) -> None:
    if not output:
        return
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(output, f"{name}.parquet"))


def run_main(body: Callable[[], dict[str, int]]) -> int:
    """Execute a pipeline body; print ONE summary JSON line on success
    (stdout is the machine interface — everything else goes to stderr/log4j),
    or the reference's failure line + exit 1 on a taxonomy error."""
    try:
        summary = body()
    except PipelineError as e:
        print(f"Pipeline failed with error {e.code}: {e.message}")
        return 1
    print(json.dumps(summary))
    return 0


def metrics_row(df: DataFrame) -> dict[str, int]:
    [row] = df.collect()
    return {k: int(v) for k, v in row.asDict().items()}
