"""TIFF I/O roundtrip + codec tests (counterpart of the vendored tifffile
stack, ref lib/tifffile.py / lib/tifffile.c)."""

import struct

import numpy as np
import pytest

from ics_tpu.utils import io

RNG = np.random.default_rng(13)


@pytest.mark.parametrize(
    "shape,dtype",
    [((7, 9), np.uint8), ((7, 9), np.uint16), ((5, 6, 3), np.uint8), ((5, 6, 3), np.uint16)],
)
def test_tiff_roundtrip(tmp_path, shape, dtype):
    arr = RNG.integers(0, np.iinfo(dtype).max, size=shape).astype(dtype)
    path = str(tmp_path / "t.tif")
    io.imsave(path, arr)
    back = io.imread(path)
    np.testing.assert_array_equal(back, arr)


def test_save_is_16bit_rgb(tmp_path):
    pic = RNG.random((8, 8, 3)).astype(np.float32) * 65535
    io.save(pic, "out", str(tmp_path))
    back = io.imread(str(tmp_path / "out.tif"))
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, pic.astype(np.uint16))


def _encode_packbits(data: bytes) -> bytes:
    """Minimal PackBits encoder (literal runs only) for decoder testing."""
    out = bytearray()
    i = 0
    while i < len(data):
        # find a run
        j = i
        while j + 1 < len(data) and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # run of length j-i+1
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:
            # literal block
            k = i
            while (
                k < len(data)
                and k - i < 128
                and not (k + 1 < len(data) and data[k + 1] == data[k])
            ):
                k += 1
            out.append(k - i - 1)
            out += data[i:k]
            i = k
    return bytes(out)


def test_packbits_decode():
    data = bytes(RNG.integers(0, 4, 300).astype(np.uint8))  # lots of runs
    enc = _encode_packbits(data)
    assert io._decode_packbits(enc, len(data)) == data


def _encode_lzw(data: bytes) -> bytes:
    """Minimal TIFF-LZW encoder (with early change) for decoder testing."""
    out_bits = []
    nbits = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code, nb):
        out_bits.append((code, nb))

    emit(256, nbits)  # clear
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w], nbits)
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << nbits) - 1:
                if nbits < 12:
                    nbits += 1
                else:  # table full: emit CLEAR and restart, like libtiff
                    emit(256, nbits)
                    table = {bytes([i]): i for i in range(256)}
                    next_code = 258
                    nbits = 9
            w = bytes([ch])
    if w:
        emit(table[w], nbits)
    emit(257, nbits)  # EOI
    # pack MSB-first
    buf = bytearray()
    acc = 0
    accbits = 0
    for code, nb in out_bits:
        acc = (acc << nb) | code
        accbits += nb
        while accbits >= 8:
            accbits -= 8
            buf.append((acc >> accbits) & 0xFF)
    if accbits:
        buf.append((acc << (8 - accbits)) & 0xFF)
    return bytes(buf)


def test_lzw_decode():
    data = b"TOBEORNOTTOBEORTOBEORNOT" * 20 + bytes(RNG.integers(0, 255, 100).astype(np.uint8))
    enc = _encode_lzw(data)
    assert io._decode_lzw(enc, len(data)) == data


def test_load_image_jpeg():
    # read one of the reference's fixtures through PIL
    arr = io.load_image("/root/reference/img/crop-blured.jpg")
    assert arr.ndim == 3 and arr.shape[2] == 3
    assert arr.dtype == np.uint8


def test_big_endian_tiff_read(tmp_path):
    """Read an MM (big-endian) TIFF written by hand."""
    import struct

    h, w = 3, 5
    # note: arithmetic on a >u2 array promotes to native order, so cast last
    data = (np.arange(h * w) * 1000).astype(">u2").reshape(h, w)
    raw = data.tobytes()
    # header + one IFD with the minimal tag set
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 3, 1, h),
    ]
    ifd_off = 8
    n = len(entries) + 2  # + strip offset/count
    data_off = ifd_off + 2 + n * 12 + 4
    entries.append((273, 4, 1, data_off))
    entries.append((279, 4, 1, len(raw)))
    entries.sort()
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off)
    buf += struct.pack(">H", n)
    for tag, typ, cnt, val in entries:
        if typ == 3:
            buf += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            buf += struct.pack(">HHII", tag, typ, cnt, val)
    buf += struct.pack(">I", 0)
    buf += raw
    p = tmp_path / "be.tif"
    p.write_bytes(buf)
    back = io.imread(str(p))
    np.testing.assert_array_equal(back, data.astype("=u2"))
