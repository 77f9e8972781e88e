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
        # the stream backend is live.  Bind split dispatch/finish pairs
        # ONCE: the job lock covers only the (cheap, ordering-relevant)
        # async dispatch; materialization happens outside it, so while
        # client A waits on its kernel, client B's is already enqueued —
        # jobs pipeline across clients (the toggle/double-buffering intent
        # at daemon scope).  Device-side execution order = dispatch order.
        self.db = db
        self.event_log = event_log
        if db is None:
            # bucketed CPU fallback: no async halves; full job under lock
            self._score_dispatch = lambda q: bank.score_database(
                q, targets, event_log=event_log)
            self._score_finish = lambda q, res, t0: res
            self._topk_dispatch = lambda q, k: bank.score_database(
                q, targets, event_log=event_log).top_k(k)
            self._topk_finish = lambda devs: devs
        elif isinstance(db, ShardedLoadedDatabase):
            from swtpu.bank.serving import (
                dispatch_loaded_sharded, finish_loaded_sharded,
            )
            import numpy as _np

            self._score_dispatch = lambda q: dispatch_loaded_sharded(q, db)
            self._score_finish = lambda q, dev, t0: finish_loaded_sharded(
                bank, q, db, dev, t0, event_log=event_log)
            self._topk_dispatch = lambda q, k: (
                time.perf_counter(), q,
                dispatch_loaded_sharded(
                    q, db, k=min(k, db.n_reads) or 1, full_scores=False),
            )

            def _fin_topk(st):
                t0, q, devs = st
                fs, fids = _np.asarray(devs[0]), _np.asarray(devs[1])
                if event_log is not None:
                    from swtpu.utils import BatchEvent

                    event_log.emit(BatchEvent(
                        "loaded_sharded_topk", t_wall=time.time(),
                        elapsed_s=time.perf_counter() - t0,
                        reads=db.n_reads,
                        cells=int(len(q)) * db.total_chars, padded_cells=0,
                        note=f"qlen={len(q)} k={len(fs)} shards={db.n_shards}",
                    ))
                return [(int(s), int(i)) for s, i in zip(fs, fids) if i >= 0]

            self._topk_finish = _fin_topk
        else:
            self._score_dispatch = lambda q: bank._dispatch_loaded(q, db)
            self._score_finish = lambda q, dev, t0: bank._finish_loaded(
                dev, q, db, t0, event_log=event_log)
            self._topk_dispatch = lambda q, k: (
                time.perf_counter(), q, bank._dispatch_topk_loaded(q, db, k)
            )
            self._topk_finish = lambda st: bank._finish_topk_loaded(
                st[2], st[1], db, st[0], event_log=event_log)
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
                t0 = time.perf_counter()
                with self._lock:
                    dev = self._score_dispatch(q)
                    self.served += 1
                res = self._score_finish(q, dev, t0)
                out = []
                for name, s in zip(self.names, res.scores):
                    ns = int((time.perf_counter() - self.t_start) * 1e9)
                    out.append(format_score_line(name, s, ns))
                return out
            if cmd == "TOP":
                k_str, seq = rest.split(None, 1)
                q = encode_seq(seq.strip())
                with self._lock:
                    devs = self._topk_dispatch(q, int(k_str))
                    self.served += 1
                top = self._topk_finish(devs)
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
