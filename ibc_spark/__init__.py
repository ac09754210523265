"""ibc_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL system (``rohankumarrrr/ibc-data-pipelines``), re-expressed as a
library of composable DataFrame operators: schema-tolerant ingest, normalize,
validate-with-quarantine, key resolution, upsert/SCD change detection, reshape
(pivot/unpivot), bulk mutation, metrics — plus large-scale training-data
pipeline extensions (dedup, similarity search, text analysis, multimodal
columns) designed for a 1000-executor / 100 TB posture.

Design stance (see SURVEY.md §7):

- DataFrame/SQL everywhere; Catalyst does pushdown/pruning/join selection.
- No row-at-a-time Python UDFs on the parity path; pandas UDFs only where
  built-ins genuinely cannot express the semantics (multimodal decode).
- Errors are data: validation/lookup failures become quarantine rows
  (error codes E001–E005), never driver exceptions.
- No driver-side collect inside any operator; dims broadcast, facts never.
"""

__version__ = "0.1.0"
