"""Multi-client serving daemon — the PSLSE multi-context analog.

The reference's PSLSE serves multiple application clients against one
device over sockets, each client opening its own context
(pslse-master/pslse/client.c; the directed multi-context tests drive two
AFU contexts at once).  swtpu's equivalent: one long-lived process holds
the device-resident database (single-chip or mesh-sharded) and serves any
number of concurrent clients over a UNIX or TCP socket, one in-flight job
per client, device dispatch serialized by the engine lock (the device is
one bank; concurrency is between clients, exactly like PSLSE's per-context
job queue).

Wire protocol (line-oriented, same commands as `swtpu serve` stdin):
    SEQ <bases>        -> one `@..ns: >name score: S` line per read
    TOP <k> <bases>    -> k `# top: >name score: S` lines
    QUIT               -> closes this client's connection
Every response block ends with a single `.` line (the terminator clients
read to), errors respond `# error: ...` + terminator and keep the
connection open.
"""

from __future__ import annotations

import os
import socket
import socketserver
import threading
import time
from typing import List, Optional


def format_score_line(name: str, score: int, ns: int) -> str:
    """The RTL testbench's golden line format (`@<time>ns: >dbK score: S`,
    ScoreBank/ScoreBank_v1_tb.sv:280-282) — ONE definition shared by the
    CLI writer and the serve daemons so the formats can never drift."""
    return f"@{ns:>9}ns: \t{'>' + name:>10} score: \t{int(score):>10}"


class ServeEngine:
    """Shared scoring engine behind every serve front-end (stdin loop,
    socket server): owns the bank, the resident database, and the
    device-dispatch lock."""

    def __init__(self, bank, names, targets, db=None, event_log=None):
        from swtpu.bank.serving import ShardedLoadedDatabase

        self.bank = bank
        self.names = names
        self.targets = targets
        # LoadedDatabase (single chip) or ShardedLoadedDatabase (mesh) when
        # the stream backend is live; bind the matching dispatches ONCE
        self.db = db
        self.event_log = event_log
        if db is None:
            self._score = lambda q: bank.score_database(
                q, targets, event_log=event_log)
            self._topk = lambda q, k: bank.score_database(
                q, targets, event_log=event_log).top_k(k)
        elif isinstance(db, ShardedLoadedDatabase):
            self._score = lambda q: bank.score_loaded_sharded(
                q, db, event_log=event_log)
            self._topk = lambda q, k: bank.topk_loaded_sharded(
                q, db, k=k, event_log=event_log)
        else:
            self._score = lambda q: bank.score_loaded(
                q, db, event_log=event_log)
            self._topk = lambda q, k: bank.topk_loaded(
                q, db, k=k, event_log=event_log)
        self.t_start = time.perf_counter()
        self.served = 0
        # ONE device job in flight at a time: the bank is one device (the
        # PSLSE job queue semantics); clients interleave at job granularity
        self._lock = threading.Lock()

    def handle(self, line: str) -> Optional[List[str]]:
        """One protocol line -> response lines (no terminator), or None for
        QUIT.  Raises nothing: protocol errors come back as lines."""
        from swtpu.io.encode import encode_seq

        line = line.strip()
        if not line or line.startswith("#"):
            return []
        try:
            cmd, rest = (line.split(None, 1) + [""])[:2]
            cmd = cmd.upper()
            if cmd == "QUIT":
                return None
            if cmd == "SEQ":
                q = encode_seq(rest.strip())
                with self._lock:
                    res = self._score(q)
                    self.served += 1
                out = []
                for name, s in zip(self.names, res.scores):
                    ns = int((time.perf_counter() - self.t_start) * 1e9)
                    out.append(format_score_line(name, s, ns))
                return out
            if cmd == "TOP":
                k_str, seq = rest.split(None, 1)
                q = encode_seq(seq.strip())
                with self._lock:
                    top = self._topk(q, int(k_str))
                    self.served += 1
                return [f"# top: >{self.names[i]} score: {s}" for s, i in top]
            raise ValueError(f"unknown command {cmd!r} (SEQ/TOP/QUIT)")
        except (ValueError, KeyError) as e:
            return [f"# error: {e}"]


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        engine: ServeEngine = self.server.engine  # type: ignore[attr-defined]
        for raw in self.rfile:
            try:
                line = raw.decode("utf-8", "replace")
            except Exception:
                line = ""
            resp = engine.handle(line)
            if resp is None:  # QUIT
                break
            self.wfile.write(("\n".join(resp + ["."]) + "\n").encode())
            self.wfile.flush()


class _ThreadedUnixServer(socketserver.ThreadingMixIn, socketserver.UnixStreamServer):
    daemon_threads = True
    allow_reuse_address = True


class _ThreadedTCPServer(socketserver.ThreadingMixIn, socketserver.TCPServer):
    daemon_threads = True
    allow_reuse_address = True


def serve_socket(
    engine: ServeEngine,
    unix_path: Optional[str] = None,
    port: Optional[int] = None,
    ready_event: Optional[threading.Event] = None,
):
    """Blocking socket server; one thread per client, jobs serialized by
    the engine lock.  Exactly one of unix_path / port."""
    if (unix_path is None) == (port is None):
        raise ValueError("pass exactly one of unix_path / port")
    if unix_path is not None:
        # SO_REUSEADDR is a no-op for AF_UNIX: a stale socket file from a
        # previous daemon would fail the bind forever — unlink it first
        try:
            if os.path.exists(unix_path):
                os.unlink(unix_path)
        except OSError:
            pass
        srv = _ThreadedUnixServer(unix_path, _Handler)
    else:
        srv = _ThreadedTCPServer(("127.0.0.1", port), _Handler)
    srv.engine = engine  # type: ignore[attr-defined]
    if ready_event is not None:
        # tests: signal bound-and-listening, and hand back the server for
        # a clean shutdown
        ready_event.server = srv  # type: ignore[attr-defined]
        ready_event.set()
    try:
        srv.serve_forever(poll_interval=0.1)
    finally:
        srv.server_close()
        if unix_path is not None:
            try:
                os.unlink(unix_path)
            except OSError:
                pass


def client_request(sock: socket.socket, line: str) -> List[str]:
    """Test/client helper: send one command line, read lines to the `.`
    terminator."""
    sock.sendall((line.rstrip("\n") + "\n").encode())
    buf = b""
    while not buf.endswith(b"\n.\n") and buf != b".\n":
        chunk = sock.recv(65536)
        if not chunk:
            break
        buf += chunk
    lines = buf.decode().splitlines()
    return [l for l in lines if l != "."]
