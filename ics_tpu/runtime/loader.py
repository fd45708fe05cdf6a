"""ctypes bindings for the native C++ thread-pool file prefetcher
(runtime/src/loader.cpp).

The host side of the data-loader role: background threads read files into
memory so the NEXT image's disk I/O overlaps the CURRENT image's
decode/upload/solve — what a training framework's input pipeline does, and
what the reference never had (it loads one image at a time on the main
thread, ref deconvolve.py:375-421).  Consumed by
``ics_tpu.utils.io.imread_sequence`` and usable directly around any
per-image loop::

    with Prefetcher() as p:
        tickets = [p.submit(path) for path in paths]
        for t in tickets:
            data = p.take(t)   # blocks only if the read hasn't finished

Falls back transparently (``available() -> False``) when libics_runtime.so
has not been built.
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
            try:
                lib.ics_loader_create.restype = ctypes.c_void_p
            except AttributeError:  # older .so without the loader
                continue
            lib.ics_loader_create.argtypes = [ctypes.c_int]
            lib.ics_loader_submit.restype = ctypes.c_longlong
            lib.ics_loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.ics_loader_size.restype = ctypes.c_longlong
            lib.ics_loader_size.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
            lib.ics_loader_take.restype = ctypes.c_longlong
            lib.ics_loader_take.argtypes = [
                ctypes.c_void_p,
                ctypes.c_longlong,
                ctypes.c_char_p,
                ctypes.c_longlong,
            ]
            lib.ics_loader_destroy.argtypes = [ctypes.c_void_p]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


class Prefetcher:
    """Thread-pool file reader.  ``submit`` queues a path and returns a
    ticket; ``take`` returns the file bytes, blocking only while the
    background read is still in flight."""

    def __init__(self, n_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "libics_runtime.so not built (run ics_tpu/runtime/build.sh)"
            )
        self._lib = lib
        self._handle = lib.ics_loader_create(int(n_threads))

    def submit(self, path: str) -> int:
        ticket = self._lib.ics_loader_submit(
            self._handle, os.fspath(path).encode()
        )
        if ticket < 0:
            raise RuntimeError(f"prefetch submit failed for {path!r}")
        return ticket

    def ready(self, ticket: int) -> bool:
        """True once the read finished (successfully or not)."""
        return self._lib.ics_loader_size(self._handle, ticket) != -1

    def take(self, ticket: int) -> bytes:
        # Poll size until the read lands so the copy buffer is exact; the
        # C-side take() would block too, but it copies at most ``cap``
        # bytes and erases the job, so a guessed cap could truncate.
        import time

        size = self._lib.ics_loader_size(self._handle, ticket)
        while size == -1:  # still pending
            time.sleep(0.0005)
            size = self._lib.ics_loader_size(self._handle, ticket)
        if size < 0:  # read error; drop the job slot
            self._lib.ics_loader_take(
                self._handle, ticket, ctypes.create_string_buffer(1), 1
            )
            raise OSError(f"prefetched read failed (ticket {ticket})")
        buf = ctypes.create_string_buffer(int(size) or 1)
        n = self._lib.ics_loader_take(self._handle, ticket, buf, size)
        if n < 0:
            raise OSError(f"prefetched read failed (ticket {ticket})")
        return buf.raw[:n]

    def close(self) -> None:
        if self._handle is not None:
            self._lib.ics_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self) -> "Prefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):  # best-effort; close() is the real API
        try:
            self.close()
        except Exception:
            pass
