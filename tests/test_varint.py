import numpy as np
import pytest

from fqzcomp5_tpu.utils import varint


@pytest.mark.parametrize("v,enc", [
    (0, b"\x00"),
    (1, b"\x01"),
    (127, b"\x7f"),
    (128, b"\x81\x00"),
    (300, b"\x82\x2c"),
    (1 << 14, b"\x81\x80\x00"),
    (0xFFFFFFFF, b"\x8f\xff\xff\xff\x7f"),
])
def test_known_encodings(v, enc):
    assert varint.put_u32(v) == enc
    got, n = varint.get_u32(enc)
    assert (got, n) == (v, len(enc))


def test_roundtrip_many():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.integers(0, 1 << 7, 100),
        rng.integers(0, 1 << 14, 100),
        rng.integers(0, 1 << 28, 100),
        rng.integers(0, 1 << 32, 100),
    ]).astype(np.uint64)
    blob = b"".join(varint.put_u32(int(v)) for v in vals)
    assert varint.put_array_u32(vals) == blob
    got, off = varint.get_array_u32(blob, 0, len(vals))
    assert off == len(blob)
    np.testing.assert_array_equal(got, vals.astype(np.uint32))
