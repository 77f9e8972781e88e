"""Multi-client serving daemon (swtpu/server.py) — the PSLSE multi-context
analog: concurrent clients against one resident bank."""

import socket
import threading

import numpy as np
import pytest

from swtpu.bank import ScoreBank
from swtpu.config import SWConfig
from swtpu.oracle import score_many_vs_one
from swtpu.server import ServeEngine, client_request, serve_socket


def _make_engine(rng, n_reads=5, backend="scan"):
    targets = [rng.integers(0, 4, size=int(rng.integers(8, 30))).astype(np.int8)
               for _ in range(n_reads)]
    names = [f"db{i+1}" for i in range(n_reads)]
    bank = ScoreBank(SWConfig(), backend=backend)
    return ServeEngine(bank, names, targets), targets


def _seq_str(codes):
    from swtpu.io.encode import CODE_BASES

    return "".join(CODE_BASES[int(c)] for c in codes)


def test_engine_handles_protocol():
    rng = np.random.default_rng(60)
    engine, targets = _make_engine(rng)
    q = rng.integers(0, 4, size=16).astype(np.int8)
    want = score_many_vs_one(q, targets)
    resp = engine.handle(f"SEQ {_seq_str(q)}")
    got = [int(l.rsplit("\t", 1)[1]) for l in resp]
    assert got == list(want)
    top = engine.handle(f"TOP 2 {_seq_str(q)}")
    assert len(top) == 2 and f"score: {max(want)}" in top[0]
    assert engine.handle("BOGUS x")[0].startswith("# error:")
    assert engine.handle("") == []
    assert engine.handle("QUIT") is None
    assert engine.served == 2


def test_two_concurrent_clients_unix_socket(tmp_path):
    """Two clients connect at once and interleave jobs; every response is
    correct and complete (the PSLSE multi-context concurrency contract)."""
    rng = np.random.default_rng(61)
    engine, targets = _make_engine(rng, n_reads=6)
    path = str(tmp_path / "swtpu.sock")
    ready = threading.Event()
    th = threading.Thread(
        target=serve_socket, kwargs=dict(engine=engine, unix_path=path,
                                         ready_event=ready),
        daemon=True,
    )
    th.start()
    assert ready.wait(10)
    srv = ready.server

    queries = [rng.integers(0, 4, size=int(rng.integers(10, 25))).astype(np.int8)
               for _ in range(4)]
    wants = [score_many_vs_one(q, targets) for q in queries]
    results = {}

    def client(cid, my_queries):
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.connect(path)
        out = []
        for qi in my_queries:
            lines = client_request(s, f"SEQ {_seq_str(queries[qi])}")
            out.append([int(l.rsplit("\t", 1)[1]) for l in lines])
            lines = client_request(s, f"TOP 1 {_seq_str(queries[qi])}")
            out.append(lines)
        s.sendall(b"QUIT\n")
        s.close()
        results[cid] = out

    t1 = threading.Thread(target=client, args=(1, [0, 1]))
    t2 = threading.Thread(target=client, args=(2, [2, 3]))
    t1.start(); t2.start()
    t1.join(60); t2.join(60)
    try:
        assert set(results) == {1, 2}
        for cid, qis in ((1, [0, 1]), (2, [2, 3])):
            out = results[cid]
            for j, qi in enumerate(qis):
                assert out[2 * j] == list(wants[qi])
                assert f"score: {max(wants[qi])}" in out[2 * j + 1][0]
        assert engine.served == 8
    finally:
        srv.shutdown()


def test_cli_serve_socket_end_to_end(tmp_path):
    """`swtpu serve --socket` through the CLI front-end, driven by a real
    client over the wire."""
    from swtpu.cli import main

    lib = tmp_path / "lib.fa"
    main(["generate", "-n", "5", "-L", "24", "-o", str(lib), "--seed", "62"])
    path = str(tmp_path / "cli.sock")
    rc = {}
    th = threading.Thread(
        target=lambda: rc.setdefault("rc", main(
            ["serve", "-l", str(lib), "--backend", "scan",
             "--socket", path])),
        daemon=True,
    )
    th.start()
    import time

    deadline = time.time() + 15
    s = None
    while time.time() < deadline:
        try:
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.connect(path)
            break
        except OSError:
            time.sleep(0.1)
            s = None
    assert s is not None, "server never bound"
    rng = np.random.default_rng(63)
    q = rng.integers(0, 4, size=14).astype(np.int8)
    lines = client_request(s, f"SEQ {_seq_str(q)}")
    from swtpu.io.loader import load_encoded

    libdb = load_encoded(str(lib))
    reads = [libdb.read(i) for i, nm in enumerate(libdb.names)
             if not nm.startswith("query")]
    want = score_many_vs_one(q, reads)
    got = [int(l.rsplit("\t", 1)[1]) for l in lines]
    assert got == list(want)
    err = client_request(s, "NOPE")
    assert err[0].startswith("# error:")
    s.close()
    # daemon keeps running for the next client (thread is daemonic; no join)


def test_tcp_port_serving(tmp_path):
    """The TCP front-end (serve_socket(port=...)) speaks the same protocol."""
    rng = np.random.default_rng(64)
    engine, targets = _make_engine(rng, n_reads=4)
    ready = threading.Event()
    # port=0 = OS-assigned, race-free; read the bound port off the server
    th = threading.Thread(
        target=serve_socket, kwargs=dict(engine=engine, port=0,
                                         ready_event=ready),
        daemon=True,
    )
    th.start()
    assert ready.wait(10)
    srv = ready.server
    port = srv.server_address[1]
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        q = rng.integers(0, 4, size=12).astype(np.int8)
        lines = client_request(s, f"SEQ {_seq_str(q)}")
        got = [int(l.rsplit("\t", 1)[1]) for l in lines]
        assert got == list(score_many_vs_one(q, targets))
        s.close()
    finally:
        srv.shutdown()


def test_unix_socket_path_reusable(tmp_path):
    """A stale AF_UNIX socket file from a dead daemon must not block the
    next daemon (round-5 review finding: SO_REUSEADDR is a no-op for
    AF_UNIX; the server unlinks stale paths)."""
    rng = np.random.default_rng(65)
    engine, targets = _make_engine(rng, n_reads=3)
    path = str(tmp_path / "reuse.sock")
    # simulate a stale socket file left by a crashed daemon
    import socket as socket_mod

    stale = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
    stale.bind(path)
    stale.close()  # file remains on disk
    ready = threading.Event()
    th = threading.Thread(
        target=serve_socket, kwargs=dict(engine=engine, unix_path=path,
                                         ready_event=ready),
        daemon=True,
    )
    th.start()
    assert ready.wait(10), "server failed to bind over the stale socket"
    srv = ready.server
    try:
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.connect(path)
        q = rng.integers(0, 4, size=10).astype(np.int8)
        lines = client_request(s, f"SEQ {_seq_str(q)}")
        assert len(lines) == 3
        s.close()
    finally:
        srv.shutdown()


def test_serve_engine_pipelines_dispatch(tmp_path):
    """The job lock covers only the async dispatch: by the time a result
    materializes, the lock is free for the next client's dispatch (the
    daemon-scope double-buffering contract)."""
    rng = np.random.default_rng(66)
    targets = [rng.integers(0, 4, size=int(rng.integers(8, 30))).astype(np.int8)
               for _ in range(5)]
    names = [f"db{i+1}" for i in range(5)]
    bank = ScoreBank(backend="stream", interpret=True)
    db = bank.load_database(targets)
    engine = ServeEngine(bank, names, targets, db=db)
    seen = {}
    orig_score = engine._score_finish
    orig_topk = engine._topk_finish
    engine._score_finish = lambda q, dev, t0: (
        seen.__setitem__("seq_locked", engine._lock.locked()),
        orig_score(q, dev, t0),
    )[1]
    engine._topk_finish = lambda st: (
        seen.__setitem__("top_locked", engine._lock.locked()),
        orig_topk(st),
    )[1]
    q = rng.integers(0, 4, size=12).astype(np.int8)
    lines = engine.handle(f"SEQ {_seq_str(q)}")
    assert [int(l.rsplit("\t", 1)[1]) for l in lines] == list(
        score_many_vs_one(q, targets))
    top = engine.handle(f"TOP 2 {_seq_str(q)}")
    assert len(top) == 2
    assert seen == {"seq_locked": False, "top_locked": False}
