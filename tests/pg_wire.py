"""Minimal PostgreSQL v3 wire-protocol COPY harness for tests.

Two halves, both speaking REAL length-prefixed v3 framing over a real
TCP socket (loopback):

- ``MiniPGServer``: an in-process server thread accepting one startup,
  answering ``COPY ... FROM STDIN`` Query messages with CopyInResponse,
  collecting CopyData payloads until CopyDone, and recording everything
  it saw (startup params, query text, raw payload bytes).
- ``wire_connect_factory``: a psycopg-shaped client (connection/cursor/
  copy context managers, exactly the surface
  ``sinks.make_copy_partition`` uses) that performs the client side:
  StartupMessage -> AuthenticationOk/ReadyForQuery, Query ->
  CopyInResponse, CopyData stream, CopyDone -> CommandComplete,
  Terminate on close.

This is what lets the COPY sink (reference src/db/db.go:175-180's
pgx.CopyFrom equivalent) have byte-level executable evidence without a
live Postgres or psycopg: the serializer's output crosses an actual
socket inside actual protocol frames, so framing bugs (length prefixes,
UTF-8 encoding, chunk splits mid-cell) would fail here, not in prod.

Message formats per the PostgreSQL protocol docs (public):
 startup: int32 len, int32 196608, (key\\0value\\0)*, \\0
 typed:   byte tag, int32 len(includes itself), payload
 CopyInResponse 'G': int8 overall-format, int16 ncols, int16 fmt*ncols
"""

from __future__ import annotations

import socket
import struct
import threading


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError(f"peer closed after {len(buf)}/{n} bytes")
        buf += chunk
    return buf


def _typed(tag: bytes, payload: bytes = b"") -> bytes:
    return tag + struct.pack("!I", 4 + len(payload)) + payload


class MiniPGServer:
    """One-connection COPY-IN server. Start with ``with MiniPGServer() as
    srv:``; srv.port is the ephemeral port; after the client finishes,
    ``srv.copy_payload`` holds the concatenated CopyData bytes and
    ``srv.queries`` the Query texts received."""

    def __init__(self, ncols: int = 1):
        self.ncols = ncols
        self.copy_payload = b""
        self.queries: list[str] = []
        self.startup_params: dict[str, str] = {}
        self.protocol_version: int | None = None
        self.got_copy_done = False
        self.got_terminate = False
        self.error: Exception | None = None

    def __enter__(self):
        self._listener = socket.create_server(("127.0.0.1", 0))
        self.port = self._listener.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *a):
        self._thread.join(timeout=10)
        self._listener.close()
        if self.error is not None:
            raise self.error
        return False

    def _serve(self) -> None:
        try:
            conn, _ = self._listener.accept()
            with conn:
                self._handle(conn)
        except Exception as e:  # surfaced by __exit__
            self.error = e

    def _handle(self, conn: socket.socket) -> None:
        # startup message (untyped: length first)
        (length,) = struct.unpack("!I", _recv_exact(conn, 4))
        body = _recv_exact(conn, length - 4)
        (self.protocol_version,) = struct.unpack("!I", body[:4])
        parts = body[4:].split(b"\x00")
        for k, v in zip(parts[0:-2:2], parts[1:-2:2]):
            if k:
                self.startup_params[k.decode()] = v.decode()
        # AuthenticationOk + ReadyForQuery(idle)
        conn.sendall(_typed(b"R", struct.pack("!I", 0)))
        conn.sendall(_typed(b"Z", b"I"))

        while True:
            tag = conn.recv(1)
            if not tag or tag == b"X":  # Terminate (or abrupt close)
                self.got_terminate = tag == b"X"
                return
            (length,) = struct.unpack("!I", _recv_exact(conn, 4))
            payload = _recv_exact(conn, length - 4)
            if tag == b"Q":
                sql = payload.rstrip(b"\x00").decode()
                self.queries.append(sql)
                if "COPY" in sql.upper() and "FROM STDIN" in sql.upper():
                    # CopyInResponse: text overall format, per-col text
                    conn.sendall(
                        _typed(
                            b"G",
                            struct.pack("!bH", 0, self.ncols)
                            + struct.pack(f"!{self.ncols}H", *([0] * self.ncols)),
                        )
                    )
                    self._copy_in(conn)
                else:  # e.g. COMMIT — empty result
                    conn.sendall(_typed(b"C", sql.split()[0].upper().encode() + b"\x00"))
                    conn.sendall(_typed(b"Z", b"I"))
            else:
                raise AssertionError(f"unexpected message tag {tag!r}")

    def _copy_in(self, conn: socket.socket) -> None:
        nrows = 0
        while True:
            tag = _recv_exact(conn, 1)
            (length,) = struct.unpack("!I", _recv_exact(conn, 4))
            payload = _recv_exact(conn, length - 4)
            if tag == b"d":  # CopyData
                self.copy_payload += payload
            elif tag == b"c":  # CopyDone
                self.got_copy_done = True
                # csv-parse the payload for the record count: a raw
                # newline count would overcount rows whose QUOTED cells
                # embed newlines (ADVICE r9, COPY FORMAT csv semantics)
                import csv
                import io

                nrows = sum(
                    1
                    for _ in csv.reader(
                        io.StringIO(self.copy_payload.decode("utf-8"))
                    )
                )
                self.copy_row_count = nrows
                conn.sendall(_typed(b"C", f"COPY {nrows}\x00".encode()))
                conn.sendall(_typed(b"Z", b"I"))
                return
            elif tag == b"f":  # CopyFail
                raise AssertionError(f"client sent CopyFail: {payload!r}")
            else:
                raise AssertionError(f"unexpected tag during COPY: {tag!r}")


class _WireCopy:
    def __init__(self, sock: socket.socket):
        self._sock = sock

    def __enter__(self):
        return self

    def write(self, data) -> None:
        b = data.encode("utf-8") if isinstance(data, str) else bytes(data)
        self._sock.sendall(_typed(b"d", b))

    def __exit__(self, exc_type, *a):
        if exc_type is not None:
            self._sock.sendall(_typed(b"f", b"aborted\x00"))
            return False
        self._sock.sendall(_typed(b"c"))
        # CommandComplete then ReadyForQuery
        _expect_tags(self._sock, [b"C", b"Z"])
        return False


class _WireCursor:
    def __init__(self, sock: socket.socket):
        self._sock = sock

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def copy(self, stmt: str) -> _WireCopy:
        self._sock.sendall(_typed(b"Q", stmt.encode() + b"\x00"))
        tag = _expect_tags(self._sock, [b"G"])
        assert tag == b"G"
        return _WireCopy(self._sock)


def _expect_tags(sock: socket.socket, stop_tags: list[bytes]) -> bytes:
    """Read typed messages until one of stop_tags; error on 'E'."""
    while True:
        tag = _recv_exact(sock, 1)
        (length,) = struct.unpack("!I", _recv_exact(sock, 4))
        payload = _recv_exact(sock, length - 4)
        if tag == b"E":
            raise RuntimeError(f"server error: {payload!r}")
        if tag in stop_tags:
            return tag


class _WireConn:
    def __init__(self, host: str, port: int, user: str = "test", dbname: str = "test"):
        self._sock = socket.create_connection((host, port))
        body = struct.pack("!I", 196608)  # protocol 3.0
        for k, v in (("user", user), ("database", dbname)):
            body += k.encode() + b"\x00" + v.encode() + b"\x00"
        body += b"\x00"
        self._sock.sendall(struct.pack("!I", 4 + len(body)) + body)
        _expect_tags(self._sock, [b"Z"])  # Auth Ok ... ReadyForQuery

    def __enter__(self):
        return self

    def cursor(self) -> _WireCursor:
        return _WireCursor(self._sock)

    def commit(self) -> None:
        pass  # single implicit transaction; server completes on CopyDone

    def __exit__(self, *a):
        self._sock.sendall(b"X" + struct.pack("!I", 4))
        self._sock.close()
        return False


def wire_connect_factory(dsn: str) -> _WireConn:
    """psycopg.connect-shaped factory over the raw v3 wire client.
    Understands ``host=H port=P`` keyword DSNs (the subset the tests
    emit)."""
    kv = dict(part.split("=", 1) for part in dsn.split() if "=" in part)
    return _WireConn(kv.get("host", "127.0.0.1"), int(kv["port"]))
