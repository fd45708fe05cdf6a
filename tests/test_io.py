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


# The production encoders are libtiff-cross-validated (tests below read
# PIL/libtiff-written streams and PIL reads ours), so they serve as the
# test encoders too — round-1's test-local LZW encoder shared an
# early-change off-by-one with the decoder, hiding the incompatibility.
from ics_tpu.utils.io import _encode_lzw_py as _encode_lzw  # noqa: E402
from ics_tpu.utils.io import _encode_packbits_py as _encode_packbits  # noqa: E402


def test_packbits_decode():
    data = bytes(RNG.integers(0, 4, 300).astype(np.uint8))  # lots of runs
    enc = _encode_packbits(data)
    assert io._decode_packbits(enc, len(data)) == data


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


def test_lzw_interoperates_with_libtiff(tmp_path):
    """Both directions against PIL/libtiff: we read its LZW streams, it
    reads ours — including streams long enough to exercise every code width
    and the mid-stream Clear."""
    from PIL import Image

    rng = np.random.default_rng(5)
    med = np.kron(
        rng.integers(0, 255, (16, 16), dtype=np.uint8), np.ones((4, 4), np.uint8)
    )
    p = str(tmp_path / "pil_lzw.tif")
    Image.fromarray(med).save(p, compression="tiff_lzw")
    with Image.open(p) as im:
        off = im.tag_v2.get(273)[0]
        cnt = im.tag_v2.get(279)[0]
    strip = open(p, "rb").read()[off : off + cnt]
    assert io._decode_lzw(strip, med.size) == med.tobytes()

    # big enough to hit the 4094-entry Clear in our encoder
    big = np.kron(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
        np.ones((4, 4, 1), np.uint8),
    )
    for comp in ("lzw", "packbits"):
        q = str(tmp_path / f"ours_{comp}.tif")
        io.imsave(q, big, compression=comp)
        assert (io.imread(q) == big).all()
        with Image.open(q) as im:
            assert (np.asarray(im) == big).all(), comp


def test_compressed_16bit_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    arr = (rng.random((60, 77, 3)) * 65535).astype(np.uint16)
    for comp in ("lzw", "packbits", None):
        p = str(tmp_path / f"c16_{comp}.tif")
        io.imsave(p, arr, compression=comp)
        back = io.imread(p)
        assert back.dtype == np.uint16
        np.testing.assert_array_equal(back, arr)


def test_python_fallback_encoders_match_native(tmp_path):
    from ics_tpu.runtime import codecs

    if not (codecs.available() and codecs.has_encoders()):
        import pytest

        pytest.skip("native codecs not built")
    rng = np.random.default_rng(7)
    data = (
        bytes(rng.integers(0, 5, 9000).astype(np.uint8))
        + bytes(rng.integers(0, 255, 9000).astype(np.uint8))
    )
    assert codecs.encode_lzw(data) == io._encode_lzw_py(data)
    assert codecs.encode_packbits(data) == io._encode_packbits_py(data)
