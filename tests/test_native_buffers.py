"""Unit tests for the numpy-free ctypes buffer helpers (codecs/native)
and the cold-start shims (utils/lazy_np, utils/lightclass).

These are the foundation of the numpy-free CLI path added in round 4:
every codec wrapper routes pointers through them, so subtle lifetime
or dtype bugs here would corrupt archives far from the cause.
"""

import ctypes
from array import array

import numpy as np
import pytest

from fqzcomp5_tpu.codecs import native


def _read_u8(ptr, n):
    return bytes(ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * n))
                 .contents)


def test_u8_bytes_zero_copy_roundtrip():
    data = bytes(range(256))
    keep, p = native._u8(data)
    assert _read_u8(p, 256) == data


def test_u8_bytearray_and_memoryview():
    ba = bytearray(b"hello world")
    keep, p = native._u8(ba)
    assert _read_u8(p, len(ba)) == bytes(ba)
    mv = memoryview(bytearray(b"spam"))
    keep2, p2 = native._u8(mv)
    assert _read_u8(p2, 4) == b"spam"
    # readonly memoryview falls back to a copy but must still read true
    ro = memoryview(b"eggs!")
    keep3, p3 = native._u8(ro)
    assert _read_u8(p3, 5) == b"eggs!"


def test_u8_empty_gives_nonnull_pointer():
    keep, p = native._u8(b"")
    assert ctypes.cast(p, ctypes.c_void_p).value == 1


def test_u32_buf_array_ndarray_and_sequence():
    a = array("I", [1, 2, 3, 4])
    keep, p, n = native.u32_buf(a)
    assert n == 4 and [p[i] for i in range(4)] == [1, 2, 3, 4]
    nd = np.arange(5, dtype=np.uint32)
    keep2, p2, n2 = native.u32_buf(nd)
    assert n2 == 5 and p2[4] == 4
    # non-contiguous ndarray gets a contiguous copy
    stride = np.arange(10, dtype=np.uint32)[::2]
    keep3, p3, n3 = native.u32_buf(stride)
    assert n3 == 5 and [p3[i] for i in range(5)] == [0, 2, 4, 6, 8]
    keep4, p4, n4 = native.u32_buf([7, 8])
    assert n4 == 2 and p4[1] == 8


def test_i64_buf_kinds():
    a = array("q", [10, -5, 1 << 40])
    keep, p = native.i64_buf(a)
    assert [p[i] for i in range(3)] == [10, -5, 1 << 40]
    nd = np.array([3, 4], dtype=np.int64)
    keep2, p2 = native.i64_buf(nd)
    assert p2[1] == 4
    carr = (ctypes.c_int64 * 2)(9, 11)
    keep3, p3 = native.i64_buf(carr)
    assert p3[1] == 11


def test_fresh_out_seal_roundtrip():
    out, p = native.fresh_out(16)
    for i in range(16):
        p[i] = i * 3 % 256
    sealed = native.seal_out(out, 16)
    assert sealed == bytes(i * 3 % 256 for i in range(16))
    # short seal copies the prefix
    out2, p2 = native.fresh_out(8)
    for i in range(8):
        p2[i] = 7
    assert native.seal_out(out2, 3) == b"\x07\x07\x07"


def test_out_scratch_reuse_and_take():
    a1, p1 = native.out_scratch(1000)
    a2, p2 = native.out_scratch(500)
    assert a1 is a2  # thread-local reuse
    p2[0] = 0x41
    p2[1] = 0x42
    assert native.take(a2, 2) == b"AB"


def test_sum_i64_and_pack_cut():
    core = array("q", [5, 5, 5, 5])
    ss = array("q", [0, 10, 20, 30])
    se = array("q", [10, 20, 30, 40])
    assert native.sum_i64(core) == 20
    # acc per record = 5 + 1 + 2*10 = 26
    k, total = native.pack_cut(core, ss, se, 0, 60, 0)
    assert (k, total) == (2, 52)
    # force_one takes an oversized first record
    k2, total2 = native.pack_cut(core, ss, se, 0, 10, 1)
    assert (k2, total2) == (1, 26)
    # cur offset respected
    k3, total3 = native.pack_cut(core, ss, se, 3, 1000, 0)
    assert (k3, total3) == (1, 26)


def test_varint_array_c_matches_python():
    from fqzcomp5_tpu.utils import varint

    vals = [0, 1, 127, 128, 300, 0xFFFF, 0xFFFFFFFF]
    blob = b"".join(varint.put_u32(v) for v in vals)
    got, end = varint.get_array_u32(blob, 0, len(vals))
    assert list(got) == vals and end == len(blob)
    assert varint.put_array_u32(array("I", vals)) == blob
    with pytest.raises(ValueError):
        varint.get_array_u32(blob[:-1], 0, len(vals))


def test_lazy_np_proxy_defers_then_delegates():
    import importlib
    import subprocess
    import sys

    # in THIS process numpy is loaded; the proxy must just delegate
    from fqzcomp5_tpu.utils.lazy_np import np as lazy
    assert lazy.uint32 is np.uint32
    # in a fresh process, importing the proxy must not import numpy
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    site = ("/opt/venv/lib/python%d.%d/site-packages"
            % sys.version_info[:2])
    # -S: the image's sitecustomize imports jax (hence numpy) eagerly
    code = (
        "import sys\n"
        "sys.path.insert(0, %r)\n"
        "sys.path.insert(0, %r)\n"
        "from fqzcomp5_tpu.utils.lazy_np import np\n"
        "assert 'numpy' not in sys.modules\n"
        "np.zeros(1)\n"
        "assert 'numpy' in sys.modules\n"
        "print('OK')\n" % (site, repo)
    )
    r = subprocess.run([sys.executable, "-S", "-c", code],
                       capture_output=True, text=True)
    assert "OK" in r.stdout, (r.stdout, r.stderr)


def test_lightclass_semantics():
    from fqzcomp5_tpu.utils import lightclass as lc

    @lc.dataclass
    class P:
        a: int
        b: int = 3
        c: list = lc.field(default_factory=list)

    p1 = P(1)
    p2 = P(1)
    assert (p1.a, p1.b, p1.c) == (1, 3, [])
    assert p1 == p2
    p2.c.append(9)
    assert p1.c == [] and p1 != p2       # independent factories
    assert "a=1" in repr(p1)
    with pytest.raises(TypeError):
        @lc.dataclass
        class Bad:
            a: int = 1
            b: int  # noqa: F821 — non-default after default
