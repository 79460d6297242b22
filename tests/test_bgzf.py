"""BGZF reader/writer round-trip tests (svtyper_tpu/bamio/bgzf.py)."""

import io
import os
import struct

import pytest

from svtyper_tpu.bamio.bgzf import (
    BGZF_EOF,
    BgzfReader,
    BgzfWriter,
    VirtualStream,
    decompress_block,
)


def _write_bgzf(tmp_path, payload: bytes, name="t.bgzf") -> str:
    path = os.path.join(str(tmp_path), name)
    with open(path, "wb") as fh:
        w = BgzfWriter(fh)
        w.write(payload)
        w.close()
    return path


def test_roundtrip_small(tmp_path):
    payload = b"hello bgzf world" * 10
    path = _write_bgzf(tmp_path, payload)
    vs = VirtualStream(BgzfReader(path))
    assert vs.read(len(payload)) == payload
    assert vs.read(100) == b""  # EOF sentinel inflates to empty


def test_roundtrip_multiblock(tmp_path):
    # > 64 KiB forces multiple blocks
    payload = bytes(range(256)) * 1024  # 256 KiB
    path = _write_bgzf(tmp_path, payload)
    vs = VirtualStream(BgzfReader(path))
    assert vs.read(len(payload)) == payload
    assert vs.eof()


def test_virtual_offsets(tmp_path):
    payload = b"A" * 70000 + b"B" * 70000
    path = _write_bgzf(tmp_path, payload)
    r = BgzfReader(path)
    vs = VirtualStream(r)
    vs.read(70000)
    vo = vs.voffset
    assert vs.read(5) == b"BBBBB"
    vs.seek(vo)
    assert vs.read(5) == b"BBBBB"
    # coffset must point at a real block boundary
    data, _ = r.block_at(vo >> 16)
    assert data


def test_eof_block_is_valid_empty_member():
    data, nxt = decompress_block(BGZF_EOF, 0)
    assert data == b""
    assert nxt == 28


def test_ends_with_eof_sentinel(tmp_path):
    path = _write_bgzf(tmp_path, b"xyz")
    with open(path, "rb") as fh:
        raw = fh.read()
    assert raw.endswith(BGZF_EOF)


def test_corrupt_magic_raises(tmp_path):
    path = _write_bgzf(tmp_path, b"data")
    with open(path, "rb") as fh:
        raw = bytearray(fh.read())
    raw[0] = 0x00
    with pytest.raises(ValueError):
        decompress_block(bytes(raw), 0)


def test_block_size_field(tmp_path):
    """BC subfield stores total block size minus one."""
    path = _write_bgzf(tmp_path, b"q" * 100)
    with open(path, "rb") as fh:
        raw = fh.read()
    xlen = struct.unpack_from("<H", raw, 10)[0]
    assert xlen == 6
    bsize = struct.unpack_from("<H", raw, 16)[0] + 1
    data, nxt = decompress_block(raw, 0)
    assert nxt == bsize
    assert data == b"q" * 100
