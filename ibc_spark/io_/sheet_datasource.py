"""Custom PySpark DataSource for the sheet-ingest boundary.

Makes the reference's HTTP sheet source (`staffing-roster-pipeline.py:75-87`
— GET → JSON array of row objects) a first-class Spark format::

    spark.dataSource.register(SheetDataSource)
    df = (spark.read.format("sheet")
          .option("url", "https://.../exec?sheet=Roster")
          .option("timeout", "10")
          .load())

This is the PySpark-4 Python Data Source API (SPARK-44076) face of the
same boundary `io_.sources.read_sheet` exposes functionally; both share
:func:`ibc_spark.io_.sources.fetch_sheet_rows`, so the E005/E003 error
taxonomy and the 10 s default timeout hold in either spelling.

Design notes:

- **Schema**: if the caller supplies none, ``schema()`` performs ONE
  driver-side fetch and derives an all-STRING schema from the union of
  row keys in first-seen order — sheet parity (a sheet export is typed
  downstream by the normalize/validate operators, never at ingest).
- **Partitions**: a sheet is a driver-scale control-plane payload, so the
  reader presents a single partition; bulk data belongs in the scan
  sources (parquet/ORC/CSV/JSON-lines). This mirrors the reference,
  whose sheet fetch is one GET into memory.
- **Transport**: executors re-fetch through the stdlib transport;
  ``file://`` URLs work (tests use them — no sockets). The injectable
  in-process transport of ``read_sheet`` cannot cross the pickle
  boundary, which is exactly why both spellings exist.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_DEFAULT_TIMEOUT = 10.0


class SheetDataSource(DataSource):
    """``spark.read.format("sheet")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "sheet"

    def _url(self) -> str:
        url = self.options.get("url") or self.options.get("path")
        if not url:
            from ibc_spark.errors import InvalidFormatError

            raise InvalidFormatError("sheet source requires .option('url', ...)")
        return url

    def _timeout(self) -> float:
        return float(self.options.get("timeout", _DEFAULT_TIMEOUT))

    def schema(self) -> T.StructType:
        from ibc_spark.io_.sources import fetch_sheet_rows

        rows = fetch_sheet_rows(self._url(), timeout=self._timeout())
        fields: list[str] = []
        for row in rows:
            for key in row:
                if key not in fields:
                    fields.append(key)
        return T.StructType(
            [T.StructField(f, T.StringType(), nullable=True) for f in fields]
        )

    def reader(self, schema: T.StructType) -> "SheetReader":
        return SheetReader(schema, self._url(), self._timeout())

    def simpleStreamReader(self, schema: T.StructType) -> "SheetStreamReader":
        """``spark.readStream.format("sheet")`` — incremental sheet
        polling. Each micro-batch re-fetches the sheet and emits only the
        rows PAST the committed offset (sheets are append-mostly; edits of
        already-consumed rows are the upsert sink's job downstream). The
        offset is the consumed row count — trivially monotone, checkpoint-
        replayable via ``readBetweenOffsets``."""
        return SheetStreamReader(schema, self._url(), self._timeout())


class SheetReader(DataSourceReader):
    def __init__(self, schema: T.StructType, url: str, timeout: float) -> None:
        self._schema = schema
        self._url = url
        self._timeout = timeout

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(0)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        from ibc_spark.io_.sources import fetch_sheet_rows

        rows = fetch_sheet_rows(self._url, timeout=self._timeout)
        names = [f.name for f in self._schema.fields]
        strings = {
            f.name for f in self._schema.fields if isinstance(f.dataType, T.StringType)
        }
        for row in rows:
            yield tuple(
                (str(v) if name in strings and v is not None else v)
                for name, v in ((n, row.get(n)) for n in names)
            )


class SheetStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"n": rows consumed}. ``read`` fetches the whole sheet
    (driver-scale payload, same contract as the batch face) and emits the
    tail past the start offset; ``readBetweenOffsets`` replays an exact
    [start, end) slice after a checkpoint recovery. A sheet that SHRANK
    below the committed offset emits nothing rather than guessing at a
    rewind (loud in the logs downstream when counts stall)."""

    def __init__(self, schema: T.StructType, url: str, timeout: float) -> None:
        self._schema = schema
        self._url = url
        self._timeout = timeout

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _rows(self) -> list[tuple]:
        from ibc_spark.io_.sources import fetch_sheet_rows

        rows = fetch_sheet_rows(self._url, timeout=self._timeout)
        names = [f.name for f in self._schema.fields]
        return [
            tuple(None if row.get(n) is None else str(row.get(n)) for n in names)
            for row in rows
        ]

    def read(self, start: dict) -> tuple:
        rows = self._rows()
        lo = int(start.get("n", 0))
        return iter(rows[lo:]), {"n": max(len(rows), lo)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows = self._rows()
        return iter(rows[int(start.get("n", 0)) : int(end.get("n", 0))])
