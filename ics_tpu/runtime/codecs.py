"""ctypes bindings for the native C++ codec library (libics_runtime.so).

Native counterparts of the reference's C TIFF codecs
(ref lib/tifffile.c:550 ``py_decodepackbits``, :658 ``py_decodelzw``).
Falls back transparently (``available() -> False``) when the library has not
been built; ``ics_tpu.utils.io`` then uses its pure-Python decoders.
"""

from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    for cand in (
        os.path.join(here, "libics_runtime.so"),
        os.path.join(here, "build", "libics_runtime.so"),
    ):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.ics_decode_packbits.restype = ctypes.c_longlong
            lib.ics_decode_packbits.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_char_p,
                ctypes.c_longlong,
            ]
            lib.ics_decode_lzw.restype = ctypes.c_longlong
            lib.ics_decode_lzw.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_char_p,
                ctypes.c_longlong,
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_packbits(data: bytes, expected: int) -> bytes:
    lib = _load()
    out = ctypes.create_string_buffer(expected)
    n = lib.ics_decode_packbits(data, len(data), out, expected)
    if n < 0:
        raise ValueError("packbits decode failed")
    return out.raw[:n]


def decode_lzw(data: bytes, expected: int) -> bytes:
    lib = _load()
    out = ctypes.create_string_buffer(expected)
    n = lib.ics_decode_lzw(data, len(data), out, expected)
    if n < 0:
        raise ValueError("lzw decode failed")
    return out.raw[:n]
