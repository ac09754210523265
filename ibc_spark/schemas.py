"""Canonical sink-table schemas — the engine's explicit form of the schema
the reference leaves implicit in its SQL text (SURVEY §1.1: tables ``users``,
``consultants``, ``projects``, ``consultant_projects``; columns per
``staffing-roster-pipeline.py:31-56``, ``projects-pipeline.py:288-301``).

Pipelines use these to create empty initial state when no snapshot exists
(first run) and to validate loaded snapshots; tests build fixture state from
the same definitions so the contract cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DAY_SHORT = ("mon", "tue", "wed", "thu", "fri", "sat", "sun")

USERS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("race", T.StringType()),
        T.StructField("us_citizen", T.BooleanType()),
        T.StructField("residency", T.BooleanType()),
        T.StructField("first_gen", T.BooleanType()),
        T.StructField("curr_role", T.StringType()),
        T.StructField("netid", T.StringType()),
    ]
)

CONSULTANTS_SCHEMA = T.StructType(
    [T.StructField("user_id", T.LongType())]
    + [
        T.StructField(c, T.StringType())
        for c in ("year", "major", "minor", "college", "consultants_score")
    ]
    + [T.StructField("semesters_in_ibc", T.IntegerType())]
    + [
        T.StructField(c, T.StringType())
        for c in (
            "time_zone",
            "willing_to_travel",
            "industry_interests",
            "functional_area_interests",
            "status",
        )
    ]
    + [T.StructField("week_before_finals_availability", T.BooleanType())]
    + [T.StructField(f"availability_{d}", T.StringType()) for d in DAY_SHORT]
)

PROJECTS_SCHEMA = T.StructType(
    [
        T.StructField("project_id", T.LongType()),
        T.StructField("project_name", T.StringType()),
        T.StructField("project_semester", T.StringType()),
        T.StructField("client_name", T.StringType()),
        T.StructField("em_id", T.LongType()),
        T.StructField("sm_id", T.LongType()),
        T.StructField("pm_id", T.LongType()),
        T.StructField("sc1_id", T.LongType()),
        T.StructField("sc2_id", T.LongType()),
    ]
)

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("project_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("role", T.StringType()),
    ]
)


def empty_state(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """Empty sink snapshot for a first pipeline run."""
    return spark.createDataFrame([], schema)
