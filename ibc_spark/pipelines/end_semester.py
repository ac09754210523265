"""E3 — end-of-semester pipeline (reference ``end-semester-pipeline.py:23-82``):
whole-table bulk mutation, rowcount reported. Two narrow projections + a
count — no shuffle; at 100 TB this is a pure map job + overwrite."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ibc_spark.ops.mutate import bulk_mutate


@dataclass(frozen=True)
class EndSemesterResult:
    consultants: DataFrame
    metrics: DataFrame  # one row: rows_updated


def run(consultants: DataFrame) -> EndSemesterResult:
    updated = bulk_mutate(
        consultants,
        updates={"status": "Deferred"},
        increments={"semesters_in_ibc": 1},
    )
    metrics = updated.agg(F.count(F.lit(1)).alias("rows_updated"))
    return EndSemesterResult(consultants=updated, metrics=metrics)


def main(argv: list[str] | None = None) -> int:
    """spark-submit entry: run E3 on the consultants snapshot and print
    ``{"updated_rows": N}`` (the JSON form of the reference's rowcount line,
    ``end-semester-pipeline.py:50-55``)."""
    from ibc_spark.pipelines import cli
    from ibc_spark.schemas import CONSULTANTS_SCHEMA

    args = cli.build_parser(
        "ibc_spark.pipelines.end_semester",
        "E3 end-of-semester bulk mutation of consultants",
        needs_rows=False,
    ).parse_args(argv)

    def body() -> dict[str, int]:
        spark = cli.get_session("end_semester", args.master)
        consultants = cli.load_state(
            spark, args.state_dir, "consultants", CONSULTANTS_SCHEMA
        )
        result = run(consultants)
        cli.write_outputs(args.output, {"consultants": result.consultants})
        m = cli.metrics_row(result.metrics)
        return {"updated_rows": m["rows_updated"]}

    return cli.run_main(body)


if __name__ == "__main__":
    import sys

    sys.exit(main())
