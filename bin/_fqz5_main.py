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
    # FQZ5_DAEMON set -> try the pre-warmed daemon first (skips the
    # ~0.35s numpy boot; fds ride over the socket so stdio behaves
    # identically).  Any failure falls through to in-process execution;
    # daemon-control verbs are always handled in-process.
    if (os.environ.get("FQZ5_DAEMON")
            and "--daemon" not in argv and "--daemon-stop" not in argv):
        from fqzcomp5_tpu import daemon
        rc = daemon.request(None, argv)
        if rc is not None:
            return rc
    from fqzcomp5_tpu.cli import main as cli_main
    return cli_main(argv)


if __name__ == "__main__":
    sys.exit(main())
