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
            for enc in ("ics_encode_packbits", "ics_encode_lzw"):
                try:
                    fn = getattr(lib, enc)
                except AttributeError:  # older .so without encoders
                    continue
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
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


def has_encoders() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "ics_encode_lzw")


def _encode(fname: str, data: bytes, worst: int) -> bytes:
    lib = _load()
    out = ctypes.create_string_buffer(worst)
    n = getattr(lib, fname)(data, len(data), out, worst)
    if n < 0:
        raise ValueError(f"{fname} failed (buffer too small?)")
    return out.raw[:n]


def encode_packbits(data: bytes) -> bytes:
    # worst case: one header byte per 128 literals, plus slack
    return _encode("ics_encode_packbits", data, len(data) + len(data) // 128 + 16)


def encode_lzw(data: bytes) -> bytes:
    # worst case ~12 bits per input byte (all-literal, max width) plus slack
    return _encode("ics_encode_lzw", data, 2 * len(data) + 64)
