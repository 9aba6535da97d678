"""Container-format parity against reference-produced golden files."""
import io
import struct

from fqzcomp5_tpu import container
from fqzcomp5_tpu.constants import VERS_V10, VERS_V11


def test_header_roundtrip():
    fp = io.BytesIO()
    container.write_header(fp)
    fp.seek(0)
    vers, off = container.read_header(fp)
    assert vers == VERS_V11 and off == 0
    container.patch_index_offset(fp, 1234)
    fp.seek(0)
    vers, off = container.read_header(fp)
    assert off == 1234


def test_golden_header_and_index(golden_dir):
    with open(golden_dir / "sample.L1.fqz5", "rb") as fp:
        vers, off = container.read_header(fp)
        assert vers == VERS_V11
        assert off > 0
        blocks = list(container.iter_raw_blocks(fp, off))
        assert len(blocks) == 1
        idx = container.read_index(fp, off)
        assert idx is not None and idx.nblocks == 1
        assert idx.entries[0].offset == 16  # first block follows header
        assert idx.entries[0].nrecords == 5  # sample.fastq has 5 reads


def test_golden_crc_walk(golden_dir):
    for name in ["sample.L1.fqz5", "sample.L5.fqz5", "paired.L5.fqz5"]:
        with open(golden_dir / name, "rb") as fp:
            vers, off = container.read_header(fp)
            for raw in container.iter_raw_blocks(fp, off):
                s = container.summarize_block(raw, has_crc=True)
                assert s.crc_ok, f"CRC failed in {name}"
                assert s.nrecords > 0


def test_legacy_v10_header(data_dir):
    with open(data_dir / "sample.fqz5", "rb") as fp:
        vers, off = container.read_header(fp)
        assert vers == VERS_V10


def test_corruption_detected(golden_dir):
    raw = bytearray((golden_dir / "sample.L5.fqz5").read_bytes())
    # stomp a byte inside the first block's payload
    raw[40] ^= 0xFF
    fp = io.BytesIO(bytes(raw))
    vers, off = container.read_header(fp)
    blocks = list(container.iter_raw_blocks(fp, off))
    s = container.summarize_block(blocks[0], has_crc=True)
    assert s.crc_ok is False


def test_index_write_matches_reference_bytes(golden_dir):
    """Re-serialize the parsed index and compare to the file's bytes."""
    data = (golden_dir / "sample.L3.fqz5").read_bytes()
    (off,) = struct.unpack_from("<Q", data, 8)
    fp = io.BytesIO(data)
    idx = container.read_index(fp, off)
    out = io.BytesIO()
    container.write_index(out, idx)
    assert data[off:off + len(out.getvalue())] == out.getvalue()
