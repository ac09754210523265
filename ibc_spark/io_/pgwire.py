"""Minimal pure-Python PostgreSQL wire-protocol (v3) client with a DB-API
face — just enough surface for the engine's DB sink path
(:func:`ibc_spark.io_.sinks.dbapi_upsert`) to run against a REAL Postgres.

Why this exists: the sandbox ships a Postgres SERVER binary but no Python
driver (pg8000/psycopg are absent and installs are off-limits), and
Spark's jars dir has no Postgres JDBC driver. The protocol itself is
public and small (PostgreSQL docs, "Frontend/Backend Protocol"): a
StartupMessage, then typed frames ``<type:1><len:int4><payload>``. This
client implements ONLY the simple-query flow over trust auth — the
integration tests (``tests/test_pgwire_integration.py``) use it to verify
the reference's actual sink semantics (unique violation → SQLSTATE 23505
→ E001, statement errors aborting the transaction until ROLLBACK, the
SAVEPOINT retry discipline) against a real server instead of the
fake-Postgres harness in ``tests/test_db_sink.py``.

Reference parity target: ``staffing-roster-pipeline.py:128-224`` (upsert
pair), ``:146-151`` (pg error 23505 → DataConflictError E001),
``:269-298`` (rollback-and-continue transaction discipline).

Deliberately NOT a general driver: simple query protocol only (no
Parse/Bind, no COPY, no TLS, no SCRAM — trust auth), parameters are
client-side-formatted literals. Do not point it at untrusted data without
reviewing :func:`_literal`.
"""

from __future__ import annotations

import datetime as _dt
import socket
import struct


class PgWireError(Exception):
    """Server ErrorResponse. ``sqlstate`` carries the five-char code the
    reference's error mapping keys on (23505 unique violation, 23502 not
    null, 25P02 in-failed-transaction, ...)."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        self.sqlstate = fields.get("C", "")
        self.severity = fields.get("S", "ERROR")
        super().__init__(f"[{self.sqlstate}] {fields.get('M', 'unknown error')}")


def _literal(v) -> str:
    """Render a Python value as a Postgres SQL literal (simple-query
    protocol has no bind parameters). Strings rely on
    standard_conforming_strings (the server default since 9.1): only
    quote-doubling is needed; NULs are rejected (Postgres cannot store
    them in text anyway)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            return f"'{v}'::float8"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return r"'\x" + bytes(v).hex() + "'::bytea"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return f"'{v.isoformat()}'"
    s = str(v)
    if "\x00" in s:
        raise ValueError("NUL byte in string literal")
    return "'" + s.replace("'", "''") + "'"


class PgWireCursor:
    """DB-API-ish cursor: ``execute``/``executemany``/``fetchall``/
    ``description``/``rowcount``. ``paramstyle`` is ``format`` (%s), the
    style :func:`dbapi_upsert` uses for Postgres."""

    def __init__(self, conn: "PgWireConnection"):
        self._conn = conn
        self.description = None
        self.rowcount = -1
        self._rows: list[tuple] = []

    def execute(self, sql: str, params=None):
        if params is not None:
            parts = sql.split("%s")
            if len(parts) - 1 != len(params):
                raise ValueError(
                    f"placeholder count {len(parts) - 1} != params {len(params)}"
                )
            out = [parts[0]]
            for lit, tail in zip((_literal(p) for p in params), parts[1:]):
                out.append(lit)
                out.append(tail)
            sql = "".join(out)
        self.description, self._rows, self.rowcount = self._conn._query(sql)
        return self

    def executemany(self, sql: str, seq_of_params):
        for params in seq_of_params:
            self.execute(sql, params)
        return self

    def fetchall(self) -> list[tuple]:
        return list(self._rows)

    def fetchone(self):
        return self._rows[0] if self._rows else None

    def close(self):  # pragma: no cover — symmetry only
        self._rows = []


class PgWireConnection:
    """One TCP (or unix-socket) connection, trust auth, DB-API semantics:
    the first ``execute`` after connect/commit/rollback opens a
    transaction (``BEGIN``), ``commit``/``rollback`` close it — matching
    the driver behavior ``dbapi_upsert``'s one-transaction-per-partition
    contract assumes. After a statement error Postgres aborts the
    transaction (subsequent statements raise 25P02) until a ROLLBACK [TO
    SAVEPOINT] — the real discipline the sink's savepoint retry exists
    for."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        unix_socket_dir: str | None = None,
    ):
        if unix_socket_dir:
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(f"{unix_socket_dir}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port), timeout=30)
        self._buf = b""
        self._in_txn = False
        body = b"user\x00" + user.encode() + b"\x00database\x00" + database.encode() + b"\x00\x00"
        payload = struct.pack("!ii", 8 + len(body), 196608) + body  # protocol 3.0
        self._sock.sendall(payload)
        self._drain_until_ready(startup=True)

    # -- frame plumbing ----------------------------------------------------
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_msg(self) -> tuple[bytes, bytes]:
        mtype = self._read_exact(1)
        (length,) = struct.unpack("!i", self._read_exact(4))
        return mtype, self._read_exact(length - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return fields

    def _drain_until_ready(self, startup: bool = False):
        err = None
        while True:
            mtype, payload = self._read_msg()
            if mtype == b"R":
                (code,) = struct.unpack("!i", payload[:4])
                if code != 0:
                    raise PgWireError(
                        {"C": "28000", "M": f"auth method {code} unsupported (trust only)"}
                    )
            elif mtype == b"E":
                err = PgWireError(self._error_fields(payload))
            elif mtype == b"Z":
                if payload[:1] == b"I":
                    self._in_txn = False
                if err:
                    raise err
                return
            # 'S' ParameterStatus, 'K' BackendKeyData, 'N' Notice: skipped

    # -- query flow --------------------------------------------------------
    def _send_query(self, sql: str):
        body = sql.encode() + b"\x00"
        self._sock.sendall(b"Q" + struct.pack("!i", 4 + len(body)) + body)

    def _query(self, sql: str, _implicit_begin: bool = True):
        if _implicit_begin and not self._in_txn:
            self._in_txn = True
            self._run_one("BEGIN")
        return self._run_one(sql)

    def _run_one(self, sql: str):
        self._send_query(sql)
        description = None
        rows: list[tuple] = []
        rowcount = -1
        err: PgWireError | None = None
        while True:
            mtype, payload = self._read_msg()
            if mtype == b"T":
                (ncols,) = struct.unpack("!h", payload[:2])
                off, cols = 2, []
                for _ in range(ncols):
                    end = payload.index(b"\x00", off)
                    name = payload[off:end].decode()
                    off = end + 1 + 18  # fixed per-column trailer
                    cols.append((name, None, None, None, None, None, None))
                description = cols
            elif mtype == b"D":
                (ncols,) = struct.unpack("!h", payload[:2])
                off, vals = 2, []
                for _ in range(ncols):
                    (ln,) = struct.unpack("!i", payload[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[off : off + ln].decode("utf-8", "replace"))
                        off += ln
                rows.append(tuple(vals))
            elif mtype == b"C":
                tag = payload.rstrip(b"\x00").decode()
                parts = tag.split()
                if parts and parts[-1].isdigit():
                    rowcount = int(parts[-1])
            elif mtype == b"E":
                err = PgWireError(self._error_fields(payload))
            elif mtype == b"Z":
                if payload[:1] == b"I":
                    self._in_txn = False
                if err:
                    raise err
                return description, rows, rowcount
            # 'N' notices / 'I' EmptyQueryResponse: skipped

    # -- DB-API face -------------------------------------------------------
    def cursor(self) -> PgWireCursor:
        return PgWireCursor(self)

    def commit(self):
        if self._in_txn:
            self._run_one("COMMIT")
            self._in_txn = False

    def rollback(self):
        if self._in_txn:
            self._run_one("ROLLBACK")
            self._in_txn = False

    def close(self):
        try:
            self._sock.sendall(b"X" + struct.pack("!i", 4))
        except OSError:  # pragma: no cover
            pass
        self._sock.close()


def connect(**kwargs) -> PgWireConnection:
    """DB-API-style module entry: ``pgwire.connect(host=..., port=...)``."""
    return PgWireConnection(**kwargs)
