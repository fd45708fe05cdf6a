"""Native C++ runtime tier: codecs and the thread-pool loader.

Builds libics_runtime.so on demand (skips if the toolchain is unavailable)
and checks the native decoders against the pure-Python fallbacks and the
loader against direct file reads.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

RNG = np.random.default_rng(61)
_RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "ics_tpu", "runtime")


@pytest.fixture(scope="module")
def native_lib():
    so = os.path.join(_RUNTIME_DIR, "libics_runtime.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["sh", os.path.join(_RUNTIME_DIR, "build.sh")],
                check=True,
                capture_output=True,
                timeout=300,
            )
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            pytest.skip(f"native toolchain unavailable: {e}")
    import ics_tpu.runtime.codecs as codecs

    codecs._LIB = None
    codecs._TRIED = False
    if not codecs.available():
        pytest.skip("libics_runtime.so did not load")
    return codecs


def test_native_codecs_match_python(native_lib):
    from ics_tpu.utils import io
    from test_io import _encode_lzw, _encode_packbits

    data = (
        b"TOBEORNOTTOBEORTOBEORNOT" * 40
        + bytes(RNG.integers(0, 255, 4000).astype(np.uint8))
        + bytes(RNG.integers(0, 4, 4000).astype(np.uint8))
    )
    enc = _encode_lzw(data)
    assert native_lib.decode_lzw(enc, len(data)) == data
    pb = _encode_packbits(data)
    assert native_lib.decode_packbits(pb, len(data)) == data

    # python fallbacks agree
    lib = native_lib._LIB
    native_lib._LIB = None
    try:
        assert io._decode_lzw(enc, len(data)) == data
        assert io._decode_packbits(pb, len(data)) == data
    finally:
        native_lib._LIB = lib


def test_thread_pool_loader(native_lib, tmp_path):
    so = os.path.join(_RUNTIME_DIR, "libics_runtime.so")
    lib = ctypes.CDLL(so)
    lib.ics_loader_create.restype = ctypes.c_void_p
    lib.ics_loader_create.argtypes = [ctypes.c_int]
    lib.ics_loader_submit.restype = ctypes.c_longlong
    lib.ics_loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ics_loader_take.restype = ctypes.c_longlong
    lib.ics_loader_take.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, ctypes.c_char_p, ctypes.c_longlong
    ]
    lib.ics_loader_destroy.argtypes = [ctypes.c_void_p]

    files = []
    for i in range(6):
        payload = bytes(RNG.integers(0, 255, 1000 + i * 37).astype(np.uint8))
        f = tmp_path / f"f{i}.bin"
        f.write_bytes(payload)
        files.append((str(f), payload))

    handle = lib.ics_loader_create(3)
    tickets = [lib.ics_loader_submit(handle, p.encode()) for p, _ in files]
    for ticket, (_, payload) in zip(tickets, files):
        buf = ctypes.create_string_buffer(len(payload) + 16)
        n = lib.ics_loader_take(handle, ticket, buf, len(buf))
        assert n == len(payload)
        assert buf.raw[:n] == payload
    # error path: missing file
    bad = lib.ics_loader_submit(handle, b"/nonexistent/nope.bin")
    buf = ctypes.create_string_buffer(16)
    assert lib.ics_loader_take(handle, bad, buf, 16) == -1
    lib.ics_loader_destroy(handle)


def test_prefetcher_binding(native_lib, tmp_path):
    """The Python Prefetcher API over the C pool: bytes parity, blocking
    take, error propagation."""
    import ics_tpu.runtime.loader as loader

    loader._LIB = None
    loader._TRIED = False
    assert loader.available()

    files = []
    for i in range(5):
        payload = bytes(RNG.integers(0, 255, 2000 + i * 101).astype(np.uint8))
        f = tmp_path / f"p{i}.bin"
        f.write_bytes(payload)
        files.append((str(f), payload))

    with loader.Prefetcher(n_threads=2) as pool:
        tickets = [pool.submit(p) for p, _ in files]
        for t, (_, payload) in zip(tickets, files):
            assert pool.take(t) == payload
        bad = pool.submit(str(tmp_path / "missing.bin"))
        with pytest.raises(OSError):
            pool.take(bad)


def test_imread_sequence_prefetch_matches_serial(native_lib, tmp_path):
    from ics_tpu.utils import io

    for i in range(4):
        arr = (RNG.random((10, 12, 3)) * 65535).astype(np.uint16)
        io.imsave(str(tmp_path / f"s{i:02d}.tif"), arr)
    pat = str(tmp_path / "s*.tif")
    fast = io.imread_sequence(pat, prefetch=True)
    slow = io.imread_sequence(pat, prefetch=False)
    assert fast.shape == (4, 10, 12, 3)
    np.testing.assert_array_equal(fast, slow)
