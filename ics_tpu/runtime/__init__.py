"""Native (C++) runtime tier: codec library + thread-pool image loader.

The reference's native tier is a hand-written CPython extension of TIFF
decoders (lib/tifffile.c) plus Cython/OpenMP solver loops.  Here the solver
lives on the TPU (XLA/Pallas); the host-side native tier is a small C++
shared library (built by ``ics_tpu/runtime/build.sh`` via CMake/ninja, bound
with ctypes) providing the byte-stream codecs and parallel file prefetch.
"""

from ics_tpu.runtime import codecs

__all__ = ["codecs"]
