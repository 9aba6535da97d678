"""Boot shim for the fast-start ``bin/fqz5`` launcher (run under python -S).

Restores site-packages (which ``-S`` drops), puts the repo root on
``sys.path``, and installs a meta-path hook that imports the image's
``sitecustomize`` (axon PJRT registration) right before the first ``import
jax`` — so host-only runs never pay the ~4s jax import, while ``-e tpu``
runs still find the TPU backend registered.
"""
import os
import sys


def _add_site_packages() -> None:
    # Under -S a venv's site-packages is not added (that happens in the
    # site module).  Derive it from the interpreter the venv launcher
    # resolved to; fall back to probing for numpy.
    cand = []
    exe = sys.executable or ""
    if exe:
        prefix = os.path.dirname(os.path.dirname(exe))
        cand.append(os.path.join(
            prefix, "lib", "python%d.%d" % sys.version_info[:2],
            "site-packages"))
    cand.append("/opt/venv/lib/python%d.%d/site-packages"
                % sys.version_info[:2])
    for p in cand:
        if os.path.isdir(p) and p not in sys.path:
            sys.path.insert(0, p)
            break


class _AxonOnJaxImport:
    """Meta-path hook: run sitecustomize (axon PJRT register) lazily.

    sitecustomize lives on PYTHONPATH (/root/.axon_site) which survives
    ``-S``; importing it registers the axon backend.  It must run before
    jax initializes backends, so firing on the first ``import jax`` is
    early enough.  sitecustomize itself imports jax — the sys.modules
    check breaks that recursion (the module object is registered before
    its body executes).
    """

    def find_spec(self, name, path=None, target=None):
        if name == "jax" and "sitecustomize" not in sys.modules:
            try:
                import sitecustomize  # noqa: F401
            except ImportError:
                pass
        return None


def main() -> int:
    _add_site_packages()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    sys.meta_path.insert(0, _AxonOnJaxImport())
    argv = sys.argv[1:]
    # Transparent daemon routing (round 5, default ON): a pre-warmed
    # daemon skips the ~55ms interpreter+package boot that the
    # reference binary never pays (fqzcomp5.c:4742 main is live in
    # ~2ms).  fds ride over the socket so stdio behaves identically.
    # Any failure falls through to in-process execution, after which
    # the launcher fire-and-forgets a background daemon spawn for the
    # NEXT invocation (never before the job: warmup must not compete
    # with user work for CPU).  Opt out with FQZ5_NO_DAEMON=1 or
    # FQZ5_DAEMON=0; daemon-control verbs always run in-process.
    use_daemon = (not os.environ.get("FQZ5_NO_DAEMON")
                  and os.environ.get("FQZ5_DAEMON", "") != "0"
                  and "--daemon" not in argv
                  and "--daemon-stop" not in argv)
    spawn_after = False
    if use_daemon:
        from fqzcomp5_tpu import daemon
        rc = daemon.request(None, argv)
        if rc is not None:
            return rc
        spawn_after = True
    from fqzcomp5_tpu.cli import main as cli_main
    rc = cli_main(argv)
    if spawn_after:
        from fqzcomp5_tpu import daemon
        daemon.spawn()
    return rc


if __name__ == "__main__":
    sys.exit(main())
