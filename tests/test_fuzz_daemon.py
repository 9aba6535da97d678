"""Fuzz the round-4/5 surfaces: daemon unix-socket protocol and the
distributed trial journal (VERDICT r4 item 9 — neither was fuzzed;
the repo's byte-flip fuzz precedent caught real bugs rounds 1-4).

Daemon: malformed/truncated/oversized requests must never kill the
server (it serves a good request afterwards) and must never hang the
client.  Journal: arbitrary bytes through journal_loads must raise
ValueError — never execute payload content (the round-5 pickle->JSON
change exists exactly for that) — and structurally-valid journals
must roundtrip.
"""
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from fqzcomp5_tpu import daemon
from fqzcomp5_tpu.learning import (MethodLearner, journal_dumps,
                                   journal_loads)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def live_daemon(tmp_path):
    sock = str(tmp_path / "fz.sock")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen(
        [sys.executable, "-c",
         "from fqzcomp5_tpu.daemon import serve; "
         f"raise SystemExit(serve({sock!r}, quiet=True))"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        if daemon.request(sock, None, op="ping"):
            break
        if p.poll() is not None:
            raise RuntimeError(
                f"daemon died: {p.stderr.read().decode()[-400:]}")
        time.sleep(0.1)
    else:
        p.kill()
        raise RuntimeError("daemon never answered ping")
    yield sock
    daemon.stop(sock)
    try:
        p.wait(timeout=10)
    except subprocess.TimeoutExpired:
        p.kill()


def _raw_send(sock_path, payload: bytes, read_reply=True,
              timeout=5.0):
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.settimeout(timeout)
    c.connect(sock_path)
    try:
        c.sendall(payload)
        if read_reply:
            try:
                return c.recv(4096)
            except socket.timeout:
                return b"<timeout>"
    finally:
        c.close()
    return b""


BAD_REQUESTS = [
    b"",                                  # connection closed, no data
    b"\n",                                # empty line
    b"not json at all\n",
    b'{"argv": \n',                       # truncated json
    b'{"op": "nonsense"}\n',
    b'[1,2,3]\n',                         # wrong top-level type
    b'{"argv": 42}\n',                    # argv not a list
    b'{"argv": ["-d"], "cwd": 7}\n',      # cwd wrong type
    b'\xff\xfe\x00bin\n',                 # binary garbage
    b'{"umask": "zzz", "argv": []}\n',    # bad umask
    # huge argv (flag-shaped entries so the child cannot create files
    # in the daemon's cwd)
    b'{"argv": [' + b'"--no-such-flag",' * 5000
    + b'"--no-such-flag"]}\n',
]


def test_daemon_survives_malformed_requests(live_daemon):
    for bad in BAD_REQUESTS:
        _raw_send(live_daemon, bad)
        # server must still answer a well-formed ping afterwards
        assert daemon.request(live_daemon, None, op="ping") is True, \
            f"daemon died after {bad[:40]!r}"


def test_daemon_oversized_request_rejected(live_daemon):
    # > _MAX_REQ bytes without a newline: server must drop it, not
    # buffer unboundedly or hang
    blob = b"A" * (daemon._MAX_REQ + 4096)
    _raw_send(live_daemon, blob, read_reply=False)
    assert daemon.request(live_daemon, None, op="ping") is True


def test_daemon_request_without_fds(live_daemon, tmp_path):
    # a valid job request but NO ancillary stdio fds: the child runs
    # with the daemon's stdio (dup2 loop is a no-op); must reply rc
    out = tmp_path / "nofd.fqz5"
    req = json.dumps({
        "argv": ["-1", os.path.join(REPO, "tests", "data",
                                    "sample.fastq"), str(out)],
        "cwd": str(tmp_path), "env": {}}).encode() + b"\n"
    rep = _raw_send(live_daemon, req, timeout=30.0)
    assert b"rc" in rep
    assert json.loads(rep.split(b"\n")[0])["rc"] == 0
    assert out.exists()
    assert daemon.request(live_daemon, None, op="ping") is True


def test_daemon_client_garbage_reply_falls_back(tmp_path):
    # a fake "daemon" that replies garbage: client must return None
    # (fallback) for ops, not crash or hang
    sock = str(tmp_path / "fake.sock")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock)
    srv.listen(1)

    import threading

    def fake():
        conn, _ = srv.accept()
        conn.recv(4096)
        conn.sendall(b"!!not json!!\n")
        conn.close()

    t = threading.Thread(target=fake, daemon=True)
    t.start()
    assert daemon.request(sock, None, op="ping") is None
    srv.close()


# ---------------------------------------------------------------------
# Trial journal


def _sample_journal():
    return [(1, {3: (1000, 250), 7: (1000, 900)}),
            (2, {0: (5, 5)}),
            (0, {15: (1 << 30, (1 << 32) - 1)})]


def test_journal_roundtrip():
    j = _sample_journal()
    assert journal_loads(journal_dumps(j)) == j


def test_journal_replay_after_wire():
    a, b = MethodLearner(), MethodLearner()
    a.method_avail = [0xFF] * len(a.method_avail)
    b.method_avail = [0xFF] * len(b.method_avail)
    for ln in (a, b):
        ln.methods_for(1)
    a.start_journal()
    a.record_trial(1, {3: (100, 10), 5: (100, 90)})
    blob = journal_dumps(a.pop_journal())
    b.replay_journal(journal_loads(blob))
    # both learners advanced identically
    assert a._usize[1] == b._usize[1]
    assert a._csize[1] == b._csize[1]
    assert a._trial[1] == b._trial[1]


@pytest.mark.parametrize("blob", [
    b"", b"\x00\x01\x02", b"null", b"{}", b"[[]]", b"[[1]]",
    b'[["x", {}]]', b'[[1, {"a": [1]}]]', b'[[1, {"2": [1,2,3]}]]',
    b'[[1, 2]]', b"[1]", b"\xff\xff\xff",
    # a pickle payload (the OLD wire format / an injection attempt):
    # must raise, never unpickle
    __import__("pickle").dumps([(1, {2: (3, 4)})]),
    # a crafted GLOBAL-opcode pickle (the classic RCE shape): reaches
    # journal_loads as plain bytes and must be rejected as non-JSON
    b"\x80\x04\x95#\x00\x00\x00\x00\x00\x00\x00\x8c\x05posix\x94"
    b"\x8c\x06system\x94\x93\x94\x8c\x08echo pwn\x94\x85\x94R\x94.",
])
def test_journal_rejects_malformed(blob):
    with pytest.raises(ValueError):
        journal_loads(blob)


def test_journal_fuzz_byte_flips():
    rng = np.random.default_rng(0)
    good = journal_dumps(_sample_journal())
    for _ in range(300):
        arr = bytearray(good)
        for _ in range(rng.integers(1, 4)):
            arr[rng.integers(0, len(arr))] = rng.integers(0, 256)
        try:
            out = journal_loads(bytes(arr))
        except ValueError:
            continue  # clean rejection
        # parse survived the flip: shape must still be journal-like
        for sec, sizes in out:
            assert isinstance(sec, int)
            for m, (u, c) in sizes.items():
                assert isinstance(m, int)
