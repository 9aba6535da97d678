"""Persistent CLI daemon: pay interpreter+numpy startup once.

The reference fqzcomp5 binary starts in milliseconds (fqzcomp5.c:4697
``main``); a python-hosted CLI pays ~0.35s of interpreter+numpy boot
per process, which dominates wall time on many-small-files workflows
(README "Performance": a 52MB -1 encode is ~1.4s of which ~0.4s is
startup).  ``fqz5 --daemon`` keeps one pre-warmed process alive;
each request forks a child (~5-10ms) that inherits the already-loaded
numpy + libfqz5 + parser modules and runs the ordinary CLI main with
the CLIENT's stdin/stdout/stderr (file descriptors passed over the
unix socket via SCM_RIGHTS), so pipes, ttys and redirections behave
exactly as a direct invocation.

Protocol (unix stream socket, one request per connection):

    client -> one JSON line {"argv": [...], "cwd": "...",
                             "env": {FQZ5_* vars}}
              with ancillary fds [stdin, stdout, stderr]
    server -> one JSON line {"rc": <exit code>}

    {"op": "ping"} -> {"ok": true}      liveness probe
    {"op": "stop"} -> {"ok": true}      shut the daemon down

Client integration: ``bin/fqz5`` routes through a running daemon when
``FQZ5_DAEMON`` is set (to the socket path, or ``1``/``auto`` for the
default path); on any connection failure it silently falls back to the
normal in-process path, so the daemon is a pure accelerator, never a
dependency.

Requests are served sequentially (fork, wait, reply) — the target
workload is a serial stream of small jobs; concurrent clients queue on
the socket.  ``-e tpu`` requests work but each forked child pays the
jax import; keep device runs in a long-lived process instead.
"""
from __future__ import annotations

import array
import json
import os
import signal
import socket
import sys

_MAX_REQ = 1 << 20


def default_socket_path() -> str:
    env = os.environ.get("FQZ5_DAEMON", "")
    if env and env not in ("1", "auto"):
        return env
    try:
        uid = os.getuid()
    except AttributeError:  # non-posix
        uid = 0
    return os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"fqz5-daemon-{uid}.sock")


def _recv_request(conn):
    """One JSON line + up to 3 ancillary fds."""
    fds: list[int] = []
    chunks: list[bytes] = []
    while True:
        data, ancdata, _flags, _addr = conn.recvmsg(
            4096, socket.CMSG_SPACE(3 * array.array("i").itemsize))
        for level, ctype, cdata in ancdata:
            if (level == socket.SOL_SOCKET
                    and ctype == socket.SCM_RIGHTS):
                a = array.array("i")
                a.frombytes(cdata[:len(cdata)
                                  - len(cdata) % a.itemsize])
                fds.extend(a)
        if not data and not ancdata:
            break
        chunks.append(data)
        if b"\n" in data:
            break
        if sum(len(c) for c in chunks) > _MAX_REQ:
            raise ValueError("request too large")
    raw = b"".join(chunks)
    line = raw.split(b"\n", 1)[0]
    if not line:
        raise ValueError("empty request")
    return json.loads(line), fds


def _send_line(conn, obj) -> None:
    conn.sendall(json.dumps(obj).encode() + b"\n")


def _preload() -> None:
    """Import the heavy modules once so every forked child inherits
    them warm (numpy ~0.3s, libfqz5 dlopen, parser/driver modules)."""
    import numpy  # noqa: F401

    from fqzcomp5_tpu import drivers, fastq, inspect_tool  # noqa: F401
    from fqzcomp5_tpu.codecs import native

    native.lib()


def _run_child(req, fds) -> None:
    """Forked child: become the client's process image-wise (fds, cwd,
    FQZ5_* env) and run the normal CLI main."""
    rc = 1
    try:
        for i, fd in enumerate(fds[:3]):
            os.dup2(fd, i)
        for fd in fds:
            if fd > 2:
                os.close(fd)
        cwd = req.get("cwd")
        if cwd:
            os.chdir(cwd)
        env = req.get("env") or {}
        for k, v in env.items():
            if k.startswith("FQZ5_") or k in ("TMPDIR",):
                os.environ[k] = str(v)
        # line-buffer stdio onto the duped fds (the inherited
        # sys.stdout wraps fd 1, which now points at the client's)
        sys.stdout.flush()
        sys.stderr.flush()
        from fqzcomp5_tpu.cli import main as cli_main

        rc = int(cli_main([str(a) for a in req.get("argv", [])]) or 0)
        sys.stdout.flush()
        sys.stderr.flush()
    except SystemExit as e:
        rc = int(e.code or 0) if not isinstance(e.code, str) else 1
    except BaseException:  # noqa: BLE001 - child must never escape
        import traceback

        traceback.print_exc()
        rc = 1
    finally:
        os._exit(rc)


def serve(socket_path: str | None = None, *, quiet: bool = False) -> int:
    """Foreground server loop (``fqz5 --daemon``).  Returns 0 on a
    clean ``stop``/SIGTERM shutdown."""
    path = socket_path or default_socket_path()
    try:
        st = os.stat(path)
        import stat as stat_m

        if stat_m.S_ISSOCK(st.st_mode):
            # probe: live daemon there already?
            if request(path, None, op="ping") is not None:
                print(f"fqz5 daemon already running on {path}",
                      file=sys.stderr)
                return 1
            os.unlink(path)  # stale socket
    except FileNotFoundError:
        pass

    _preload()
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        srv.bind(path)
    except OSError as e:
        print(f"ERROR: cannot bind {path}: {e}", file=sys.stderr)
        return 1
    os.chmod(path, 0o600)
    srv.listen(16)

    stop = {"flag": False}

    def _sigterm(_sig, _frm):
        stop["flag"] = True
        raise InterruptedError

    old_term = signal.signal(signal.SIGTERM, _sigterm)
    old_int = signal.signal(signal.SIGINT, _sigterm)
    if not quiet:
        print(f"fqz5 daemon listening on {path}", file=sys.stderr,
              flush=True)
    try:
        while not stop["flag"]:
            try:
                conn, _ = srv.accept()
            except InterruptedError:
                break
            with conn:
                try:
                    req, fds = _recv_request(conn)
                except Exception:  # noqa: BLE001 - bad client
                    continue
                try:
                    op = req.get("op")
                    if op == "ping":
                        _send_line(conn, {"ok": True})
                        continue
                    if op == "stop":
                        _send_line(conn, {"ok": True})
                        stop["flag"] = True
                        continue
                    pid = os.fork()
                    if pid == 0:
                        srv.close()
                        conn.close()
                        _run_child(req, fds)  # never returns
                    _, status = os.waitpid(pid, 0)
                    rc = os.waitstatus_to_exitcode(status)
                    if rc < 0:  # killed by signal N -> 128+N
                        rc = 128 - rc
                    try:
                        _send_line(conn, {"rc": rc})
                    except OSError:
                        pass  # client went away
                finally:
                    for fd in fds:
                        try:
                            os.close(fd)
                        except OSError:
                            pass
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)
        srv.close()
        try:
            os.unlink(path)
        except OSError:
            pass
    return 0


def request(socket_path: str | None, argv, *, op: str | None = None,
            timeout: float = 5.0):
    """Client side: run ``argv`` through the daemon.  Returns the exit
    code, ``{"ok": True}``-truthiness for ops, or None when no daemon
    answers (caller falls back to in-process execution).

    The client's OWN stdin/stdout/stderr fds ride along, so output
    ordering/buffering matches a direct run; the call blocks until the
    daemon child exits (no timeout: jobs can be long)."""
    path = socket_path or default_socket_path()
    try:
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.settimeout(timeout)
        conn.connect(path)
    except OSError:
        return None
    with conn:
        try:
            if op:
                _send_line(conn, {"op": op})
            else:
                env = {k: v for k, v in os.environ.items()
                       if k.startswith("FQZ5_") or k == "TMPDIR"}
                env.pop("FQZ5_DAEMON", None)  # child must not recurse
                msg = json.dumps({"argv": list(argv),
                                  "cwd": os.getcwd(),
                                  "env": env}).encode() + b"\n"
                fds = array.array("i", [0, 1, 2])
                conn.sendmsg([msg], [(socket.SOL_SOCKET,
                                      socket.SCM_RIGHTS,
                                      fds.tobytes())])
            conn.settimeout(None)  # the job may run for minutes
            buf = b""
            while b"\n" not in buf:
                d = conn.recv(4096)
                if not d:
                    return None
                buf += d
            rep = json.loads(buf.split(b"\n", 1)[0])
        except (OSError, ValueError):
            return None
    if op:
        return rep.get("ok")
    return rep.get("rc")


def stop(socket_path: str | None = None) -> bool:
    return bool(request(socket_path, None, op="stop"))
