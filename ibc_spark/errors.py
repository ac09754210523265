"""Pipeline error taxonomy — engine counterpart of the reference's
``pipelines/errors.py:1-24`` (codes E001–E005, message format ``[code] msg``).

The engine raises these only at JOB boundaries (source fetch, database
connection): row-level problems become quarantine DATA (``ops.validate``,
``io_.sinks``), never driver exceptions, because at 100 TB a single bad row
must not kill a thousand-executor job. The string constants live in
``ops.validate`` (E_DATA_CONFLICT etc.) for use inside DataFrame columns;
these classes are the control-plane face of the same codes.
"""

from __future__ import annotations


class PipelineError(Exception):
    """Base: carries a stable machine-readable ``code`` plus ``message``;
    str() renders ``[code] message`` like the reference."""

    def __init__(self, code: str, message: str):
        super().__init__(f"[{code}] {message}")
        self.code = code
        self.message = message


class DataConflictError(PipelineError):
    def __init__(self, detail: str = "Duplicate or conflicting data detected"):
        super().__init__("E001", detail)


class AuthorizationError(PipelineError):
    def __init__(self, detail: str = "User not authorized to perform this operation"):
        super().__init__("E002", detail)


class InvalidFormatError(PipelineError):
    def __init__(self, detail: str = "Invalid data format or missing field"):
        super().__init__("E003", detail)


class DatabaseConnectionError(PipelineError):
    def __init__(self, detail: str = "Failed to connect to database"):
        super().__init__("E004", detail)


class SheetReadError(PipelineError):
    def __init__(self, detail: str = "Failed to read data from Google Sheet"):
        super().__init__("E005", detail)
