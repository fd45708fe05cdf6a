"""Build the reference's checked-in Cython-generated solver as a real
extension module, so parity tests compare against the actual compiled
reference (lib/deconvolution.pyx:341-675) rather than a re-derived oracle.

The translation unit (/root/reference/lib/deconvolution.c, Cython 0.28.2,
2018) predates Python 3.9+/NumPy 2 API removals, so we compile a PATCHED
COPY under /tmp: every patch below touches only Cython/NumPy *boilerplate*
(type-slot init, traceback plumbing, dtype-struct accessors) — zero
algorithmic lines change, so the numerical behavior is the reference's own.

Nothing here is imported by the ics_tpu package; it is test scaffolding.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os
import re
import subprocess
import sys
import sysconfig

REF_C = "/root/reference/lib/deconvolution.c"
BUILD_DIR = "/tmp/ics_ref_solver"

# (pattern, replacement, expected_count) — counts are asserted so that a
# silent non-match (e.g. a different reference checkout) fails loudly.
_PATCHES: list[tuple[str, str, int]] = [
    # Py_SIZE / Py_REFCNT became non-lvalues (py3.11/3.12).
    (r"Py_SIZE\(list\) = len\+1;", "Py_SET_SIZE(list, len+1);", 2),
    (r"\+\+Py_REFCNT\(o\);", "Py_SET_REFCNT(o, Py_REFCNT(o) + 1);", 3),
    (r"--Py_REFCNT\(o\);", "Py_SET_REFCNT(o, Py_REFCNT(o) - 1);", 3),
    # tp_print slot removed in py3.9.
    (r"^(\s*__pyx_type\S*)\.tp_print = 0;$", r"\1.tp_getattro = \1.tp_getattro; /* tp_print removed */", 4),
    # PyThreadState.curexc_traceback removed in py3.12: use the public
    # fetch/restore protocol in __Pyx_Raise's traceback splice.
    (
        r"PyThreadState \*tstate = __Pyx_PyThreadState_Current;\n"
        r"        PyObject\* tmp_tb = tstate->curexc_traceback;\n"
        r"        if \(tb != tmp_tb\) \{\n"
        r"            Py_INCREF\(tb\);\n"
        r"            tstate->curexc_traceback = tb;\n"
        r"            Py_XDECREF\(tmp_tb\);\n"
        r"        \}",
        "PyObject *tmp_type, *tmp_value, *tmp_tb;\n"
        "        PyErr_Fetch(&tmp_type, &tmp_value, &tmp_tb);\n"
        "        Py_INCREF(tb);\n"
        "        PyErr_Restore(tmp_type, tmp_value, tb);\n"
        "        Py_XDECREF(tmp_tb);",
        1,
    ),
    # PyCode_New signature changed (py3.8/3.11+); a location-only code
    # object is all Cython needs here (one pickling helper + tracebacks).
    (
        r"#define __Pyx_PyCode_New\(a, k, l, s, f, code, c, n, v, fv, cell, fn, name, fline, lnos\)\\\n"
        r"          PyCode_New\(a, k, l, s, f, code, c, n, v, fv, cell, fn, name, fline, lnos\)\n"
        r"  #define __Pyx_DefaultClassType PyType_Type",
        "#define __Pyx_PyCode_New(a, k, l, s, f, code, c, n, v, fv, cell, fn, name, fline, lnos)\\\n"
        "          PyCode_NewEmpty(\"cython_shim\", \"cython_shim\", fline)\n"
        "  #define __Pyx_DefaultClassType PyType_Type",
        1,
    ),
    # C-level tracebacks poke PyFrameObject internals (opaque in py3.11+);
    # they are cosmetic — drop them.
    (
        r"(static void __Pyx_AddTraceback\(const char \*funcname, int c_line,\n"
        r"                               int py_line, const char \*filename\) \{)",
        r"\1\n    if (funcname && filename && (c_line | py_line)) return; /* frame internals are opaque on py3.11+ */",
        1,
    ),
    # PyFrameObject is opaque in py3.11+ (macro only used by the no-op'd
    # traceback path above).
    (
        r"#define __Pyx_PyFrame_SetLineNumber\(frame, lineno\)  \(frame\)->f_lineno = \(lineno\)",
        "#define __Pyx_PyFrame_SetLineNumber(frame, lineno)  ((void)(frame), (void)(lineno))",
        1,
    ),
    # PyUnicode_FromUnicode removed in py3.12 (empty-string fast path only).
    (r"PyUnicode_FromUnicode\(NULL, 0\)", "PyUnicode_FromStringAndSize(NULL, 0)", 1),
    # PyUnicode_GET_SIZE removed in py3.12; strings are always "ready" on
    # 3.12 so GET_LENGTH is the exact equivalent at every remaining site.
    (r"PyUnicode_GET_SIZE\(", "PyUnicode_GET_LENGTH(", 7),
    # NumPy 2: dtype struct fields moved behind PyDataType_* accessors.
    (r"(__pyx_v_\w+)->subarray", r"PyDataType_SUBARRAY(\1)", 2),
    (r"(__pyx_v_\w+)->names", r"PyDataType_NAMES(\1)", 2),
    (r"(__pyx_v_\w+)->fields", r"PyDataType_FIELDS(\1)", 2),
    (r"(__pyx_v_\w+)->elsize", r"PyDataType_ELSIZE(\1)", 1),
]

_CFLAGS = [
    "-O3",
    "-fopenmp",
    "-shared",
    "-fPIC",
    # ffast-math matches the reference build (ref setup.py:27-28) minus
    # -march=native (not portable; numerics validated by SSIM, not bitwise).
    "-ffast-math",
    "-finline-functions",
    # Disable Cython fast paths that reach into interpreter internals
    # removed by py3.12; the public-API fallbacks are semantically equal.
    "-DCYTHON_USE_PYLONG_INTERNALS=0",
    "-DCYTHON_FAST_THREAD_STATE=0",
    "-DCYTHON_FAST_PYCALL=0",
    "-DCYTHON_USE_UNICODE_INTERNALS=0",
    "-DCYTHON_USE_TP_FINALIZE=0",
    "-DCYTHON_USE_PYLIST_INTERNALS=0",
    "-DCYTHON_USE_PYTYPE_LOOKUP=0",
    "-DCYTHON_USE_DICT_VERSIONS=0",
    "-DCYTHON_FAST_GIL=0",
    "-DHAVE_STDARG_PROTOTYPES=1",
    "-DNPY_NO_DEPRECATED_API=0",
]


def _patched_source() -> str:
    with open(REF_C, encoding="utf-8", errors="surrogateescape") as fh:
        src = fh.read()
    for pattern, repl, expected in _PATCHES:
        src, n = re.subn(pattern, repl, src, flags=re.MULTILINE)
        if n != expected:
            raise RuntimeError(
                f"reference patch matched {n} times, expected {expected}: {pattern[:60]}"
            )
    return src


def build_reference_solver() -> str:
    """Compile (once, cached) and return the path to deconvolution.so."""
    os.makedirs(BUILD_DIR, exist_ok=True)
    so_path = os.path.join(BUILD_DIR, "deconvolution.so")
    stamp = os.path.join(BUILD_DIR, "stamp.txt")
    key = f"{os.path.getmtime(REF_C)}|{sys.version_info[:2]}|{_CFLAGS}|{len(_PATCHES)}"
    if os.path.exists(so_path) and os.path.exists(stamp):
        with open(stamp) as fh:
            if fh.read() == key:
                return so_path

    c_path = os.path.join(BUILD_DIR, "deconvolution.c")
    with open(c_path, "w", encoding="utf-8", errors="surrogateescape") as fh:
        fh.write(_patched_source())

    import numpy

    cmd = (
        ["gcc", *_CFLAGS]
        + ["-I" + sysconfig.get_paths()["include"], "-I" + numpy.get_include()]
        + [c_path, "-o", so_path, "-lm", "-lgomp"]
    )
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(f"reference solver build failed:\n{proc.stderr[-4000:]}")
    with open(stamp, "w") as fh:
        fh.write(key)
    return so_path


def load_reference_solver():
    """Import the compiled reference module (building it if needed)."""
    if "deconvolution" in sys.modules:
        return sys.modules["deconvolution"]
    so_path = build_reference_solver()
    loader = importlib.machinery.ExtensionFileLoader("deconvolution", so_path)
    spec = importlib.util.spec_from_file_location("deconvolution", so_path, loader=loader)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["deconvolution"] = mod
    loader.exec_module(mod)
    return mod


if __name__ == "__main__":
    mod = load_reference_solver()
    print("loaded:", mod)
    print("symbols:", [s for s in dir(mod) if not s.startswith("_")])
