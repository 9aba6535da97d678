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

Client integration: ``bin/fqz5`` routes through a running daemon BY
DEFAULT (round 5: transparent, opt-out with ``FQZ5_NO_DAEMON=1`` or
``FQZ5_DAEMON=0``; ``FQZ5_DAEMON=<path>`` picks a custom socket).  On
any connection failure it silently falls back to the normal in-process
path and fire-and-forgets a background daemon spawn *after* the job
finishes (so warmup never competes with the user's work for CPU), so
the daemon is a pure accelerator, never a dependency.

Safety rails for transparency:

- **Staleness**: the server records an mtime/size token over
  ``libfqz5.so`` + every package ``.py`` at startup and re-checks it
  per request; a mismatch (rebuild, git pull) answers
  ``{"stale": true}`` — the client falls back in-process and the
  daemon exits so the next invocation respawns it fresh.
- **Idle timeout**: auto-spawned daemons exit after
  ``FQZ5_DAEMON_IDLE`` seconds (default 1800) without a request, so
  they never outlive a working session by much.
- **umask**: forwarded per-request so output-file permissions match a
  direct run.

Each connection is dispatched on a handler thread (fork job child,
waitpid, send ``{"rc"}``), so concurrent clients run genuinely in
parallel — a transparent daemon must not serialize two simultaneous
``fqz5`` invocations that would otherwise each own a process.  Handler
threads perform no imports (everything is preloaded), so the fork never
races an import lock.  ``-e tpu`` requests work but each forked child
pays the jax import; keep device runs in a long-lived process instead.
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
    if env and env not in ("0", "1", "auto"):
        return env
    try:
        uid = os.getuid()
    except AttributeError:  # non-posix
        uid = 0
    return os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"fqz5-daemon-{uid}.sock")


def _code_token():
    """(path, mtime_ns, size) over the native lib + package sources.

    Recomputed per request (~40 stats, tens of microseconds); any
    change means the warm process image no longer matches the code on
    disk, so the daemon must retire rather than serve stale code."""
    pkg = os.path.dirname(os.path.abspath(__file__))
    entries = []
    lib = os.path.join(os.path.dirname(pkg), "native", "libfqz5.so")
    paths = [lib]
    for dirpath, _dirs, files in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        paths.extend(os.path.join(dirpath, f)
                     for f in files if f.endswith(".py"))
    for p in sorted(paths):
        try:
            st = os.stat(p)
            entries.append((p, st.st_mtime_ns, st.st_size))
        except OSError:
            entries.append((p, -1, -1))
    return tuple(entries)


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
    req = json.loads(line)
    if not isinstance(req, dict):
        # fuzz finding (round 5): a JSON non-object request reached
        # req.get() in the accept loop and killed the server
        raise ValueError("request must be a JSON object")
    return req, fds


def _send_line(conn, obj) -> None:
    conn.sendall(json.dumps(obj).encode() + b"\n")


def _preload() -> None:
    """Import the heavy modules once so every forked child inherits
    them warm (numpy ~0.3s, libfqz5 dlopen, parser/driver modules)."""
    import numpy  # noqa: F401

    from fqzcomp5_tpu import cli, drivers, fastq  # noqa: F401
    from fqzcomp5_tpu import inspect_tool  # noqa: F401
    from fqzcomp5_tpu.codecs import native

    native.lib()


def _run_child(req, fds) -> None:
    """Forked child: become the client's process image-wise (fds, cwd,
    FQZ5_* env) and run the normal CLI main."""
    rc = 1
    try:
        # the serve() loop's SIGTERM/SIGINT handlers are inherited and
        # would raise into job code; restore defaults
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.SIG_DFL)
        for i, fd in enumerate(fds[:3]):
            os.dup2(fd, i)
        for fd in fds:
            if fd > 2:
                os.close(fd)
        cwd = req.get("cwd")
        if cwd:
            os.chdir(cwd)
        if req.get("umask") is not None:
            os.umask(int(req["umask"]))
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


def serve(socket_path: str | None = None, *, quiet: bool = False,
          idle_timeout: float | None = None) -> int:
    """Foreground server loop (``fqz5 --daemon``).  Returns 0 on a
    clean ``stop``/SIGTERM shutdown, idle-timeout expiry, or stale-code
    retirement."""
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
    token = _code_token()
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        srv.bind(path)
    except OSError as e:
        print(f"ERROR: cannot bind {path}: {e}", file=sys.stderr)
        return 1
    os.chmod(path, 0o600)
    try:
        bound_ino = os.stat(path).st_ino
    except OSError:
        bound_ino = None
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
    if idle_timeout:
        srv.settimeout(idle_timeout)

    import threading

    workers: list[threading.Thread] = []

    def _handle(conn, req, fds):
        """One job: fork, wait, relay rc.  Runs on its own thread so
        concurrent clients execute in parallel (no imports here — the
        fork must never race an import lock)."""
        try:
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
            conn.close()

    try:
        while not stop["flag"]:
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                workers = [t for t in workers if t.is_alive()]
                if workers:
                    continue  # jobs in flight: not idle
                if not quiet:
                    print("fqz5 daemon: idle timeout, exiting",
                          file=sys.stderr)
                break
            except InterruptedError:
                break
            try:
                req, fds = _recv_request(conn)
            except Exception:  # noqa: BLE001 - bad client
                conn.close()
                continue
            op = req.get("op")
            if op in ("ping", "stop"):
                try:
                    _send_line(conn, {"ok": True})
                except OSError:
                    pass
                conn.close()
                if op == "stop":
                    stop["flag"] = True
                continue
            if _code_token() != token:
                # code changed on disk since preload: refuse (client
                # falls back in-process) and retire so the next
                # invocation respawns a fresh daemon.
                try:
                    _send_line(conn, {"stale": True})
                except OSError:
                    pass
                conn.close()
                stop["flag"] = True
                continue
            t = threading.Thread(target=_handle, args=(conn, req, fds),
                                 daemon=True)
            t.start()
            workers.append(t)
            workers = [w for w in workers if w.is_alive()]
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)
        srv.close()
        for t in workers:  # let in-flight jobs finish + reply
            t.join(timeout=600)
        try:
            # only remove the socket if it is still OURS — a stale
            # retirement may race a freshly respawned daemon that has
            # already rebound this path
            if bound_ino is None or os.stat(path).st_ino == bound_ino:
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
                um = os.umask(0)
                os.umask(um)
                msg = json.dumps({"argv": list(argv),
                                  "cwd": os.getcwd(),
                                  "umask": um,
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
    if rep.get("stale"):
        return None  # daemon is retiring; caller runs in-process
    return rep.get("rc")


def stop(socket_path: str | None = None) -> bool:
    return bool(request(socket_path, None, op="stop"))


def spawn(socket_path: str | None = None) -> None:
    """Fire-and-forget a detached background daemon (auto-spawn path).

    Called by the launcher AFTER an in-process job completes so warmup
    (~0.4s of numpy + lib preload) never competes with user work on a
    small box.  Losing a spawn race is harmless: the second server's
    bind/ping probe sees the first and exits quietly."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fqz5 = os.path.join(repo, "bin", "fqz5")
    argv = [fqz5, "--daemon", "--daemon-quiet"]
    if socket_path:
        argv.append(socket_path)
    env = dict(os.environ)
    env.setdefault("FQZ5_DAEMON_IDLE", "1800")
    try:
        subprocess.Popen(
            argv, start_new_session=True, env=env,
            stdin=subprocess.DEVNULL, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, close_fds=True)
    except OSError:
        pass  # auto-spawn is best-effort by design
