"""ctypes bindings for the native entropy spine (native/libh264pip.so).

The C++ library implements the bit-serial host path: Annex-B parsing,
CAVLC/CABAC entropy decode + re-encode, the context-modeled arithmetic
coder, and the .pip container (reference parity: the Pied-Piper layer in
codec/decoder/core plus the entropy writers in codec/encoder/core).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libh264pip.so")

_lib = None


class PipStats(ctypes.Structure):
    _fields_ = [
        ("in_bytes", ctypes.c_uint64),
        ("out_bytes", ctypes.c_uint64),
        ("n_nals", ctypes.c_uint64),
        ("n_slices", ctypes.c_uint64),
        ("n_fallback_slices", ctypes.c_uint64),
        ("n_frames", ctypes.c_uint64),
        ("n_mbs", ctypes.c_uint64),
    ]


@dataclass
class Stats:
    in_bytes: int = 0
    out_bytes: int = 0
    n_nals: int = 0
    n_slices: int = 0
    n_fallback_slices: int = 0
    n_frames: int = 0
    n_mbs: int = 0


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "-j", str(os.cpu_count() or 4)],
        check=True,
        capture_output=True,
    )


def _needs_rebuild() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    src_dir = os.path.join(_NATIVE_DIR, "src")
    for f in os.listdir(src_dir):
        if f.endswith((".cc", ".h")):
            if os.path.getmtime(os.path.join(src_dir, f)) > lib_mtime:
                return True
    return False


def load():
    global _lib
    if _lib is not None:
        return _lib
    if _needs_rebuild():
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pip_compress_c.restype = ctypes.c_int
    lib.pip_compress_c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(PipStats),
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.pip_decompress_c.restype = ctypes.c_int
    lib.pip_decompress_c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(PipStats),
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.pip_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.pip_selftest_arith.restype = ctypes.c_int
    lib.pip_selftest_arith.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    _lib = lib
    return lib


def _stats_from(c: PipStats) -> Stats:
    return Stats(
        in_bytes=c.in_bytes,
        out_bytes=c.out_bytes,
        n_nals=c.n_nals,
        n_slices=c.n_slices,
        n_fallback_slices=c.n_fallback_slices,
        n_frames=c.n_frames,
        n_mbs=c.n_mbs,
    )


def compress(data: bytes, verify: bool = True) -> tuple[bytes, Stats]:
    """Compress an Annex-B .264 stream to the .pip container format."""
    lib = load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_size_t()
    st = PipStats()
    err = ctypes.create_string_buffer(1024)
    rc = lib.pip_compress_c(
        data, len(data), 1 if verify else 0, ctypes.byref(out),
        ctypes.byref(out_size), ctypes.byref(st), err, len(err),
    )
    if rc != 0:
        raise RuntimeError(f"pip_compress failed: {err.value.decode()}")
    try:
        result = ctypes.string_at(out, out_size.value)
    finally:
        lib.pip_free(out)
    return result, _stats_from(st)


def decompress(data: bytes) -> tuple[bytes, Stats]:
    """Reconstruct the original .264 byte stream from a .pip container."""
    lib = load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_size_t()
    st = PipStats()
    err = ctypes.create_string_buffer(1024)
    rc = lib.pip_decompress_c(
        data, len(data), ctypes.byref(out), ctypes.byref(out_size),
        ctypes.byref(st), err, len(err),
    )
    if rc != 0:
        raise RuntimeError(f"pip_decompress failed: {err.value.decode()}")
    try:
        result = ctypes.string_at(out, out_size.value)
    finally:
        lib.pip_free(out)
    return result, _stats_from(st)


def selftest_arith() -> None:
    lib = load()
    err = ctypes.create_string_buffer(1024)
    rc = lib.pip_selftest_arith(err, len(err))
    if rc != 0:
        raise RuntimeError(f"arith selftest failed: {err.value.decode()}")
