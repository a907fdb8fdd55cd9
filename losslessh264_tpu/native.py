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
        ("bill", ctypes.c_double * 64),
        ("bench", ctypes.c_double * 64),
        ("prior_total", ctypes.c_double * 64),
        ("prior_hits", ctypes.c_double * 64),
    ]


# Mirrors BillTag in native/src/engine.h (order matters). Reference
# analog: the ~70-tag list in billing.h:6-55, condensed to the features
# the model actually codes plus stream-framing overhead buckets.
BILL_NAMES = [
    "mb_type", "skip", "end", "cbp", "cbp_luma", "cbp_chroma", "qp_delta",
    "i4_mode", "i8_mode", "i16_mode", "chroma_mode", "sub_mb", "ref_idx",
    "mvd_x", "mvd_y", "t8x8_flag", "luma_dc", "chroma_dc", "luma_nz",
    "luma_ac", "luma_run", "chroma_nz", "chroma_ac", "chroma_run", "pcm",
    "startcode", "nal_hdr", "param_set", "slice_hdr", "trailing",
    "raw_fallback", "container", "other", "luma_ac_sign", "luma_ac_mag",
    "cabac_cbf", "cabac_sig", "cabac_last", "cabac_sign",
    "mvd_sub_x", "mvd_sub_y", "chroma_ac_sign", "chroma_ac_mag",
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
    # ours ledger: compressed output bits per feature; sums to 8*out_bytes
    bill: dict | None = None
    # bench ledger: bits the ORIGINAL H.264 spent per feature (reference
    # BILL_BITS, dec_golomb.h:71-82); sums to 8*in_bytes
    bench: dict | None = None
    # per-feature adaptive-coder hit rates (PIP_PRIOR_STATS=1; reference
    # PRIOR_STATS analog): tag -> (decisions, predicted-symbol hits)
    prior: dict | None = None


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
    lib.pip_compress_sharded_c.restype = ctypes.c_int
    lib.pip_compress_sharded_c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(PipStats),
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.pip_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.pip_selftest_arith.restype = ctypes.c_int
    lib.pip_selftest_arith.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.pip_version_c.restype = ctypes.c_int
    _lib = lib
    return lib


def container_version() -> int:
    """The native engine's .pip format/model revision byte. Python-side
    container assemblers (checkpoint, multihost shard assembly) write
    this instead of hardcoding it — a mismatch makes decompress reject
    the file with a clear version error."""
    return int(load().pip_version_c())


def _stats_from(c: PipStats) -> Stats:
    bill = {BILL_NAMES[i]: c.bill[i] for i in range(len(BILL_NAMES))
            if c.bill[i] > 0}
    bench = {BILL_NAMES[i]: c.bench[i] for i in range(len(BILL_NAMES))
             if c.bench[i] > 0}
    prior = {BILL_NAMES[i]: (c.prior_total[i], c.prior_hits[i])
             for i in range(len(BILL_NAMES)) if c.prior_total[i] > 0}
    return Stats(
        in_bytes=c.in_bytes,
        out_bytes=c.out_bytes,
        n_nals=c.n_nals,
        n_slices=c.n_slices,
        n_fallback_slices=c.n_fallback_slices,
        n_frames=c.n_frames,
        n_mbs=c.n_mbs,
        bill=bill,
        bench=bench or None,
        prior=prior or None,
    )


def gop_starts(data: bytes) -> list[int]:
    """Byte offsets of GOP (IDR access-unit) segment starts."""
    lib = load()
    if not hasattr(lib.pip_gop_starts_c, "_cfg"):
        lib.pip_gop_starts_c.restype = ctypes.c_int
        lib.pip_gop_starts_c.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.pip_gop_starts_c._cfg = True
    cap = 65536
    buf = (ctypes.c_uint64 * cap)()
    n = ctypes.c_size_t()
    err = ctypes.create_string_buffer(512)
    rc = lib.pip_gop_starts_c(data, len(data), buf, cap, ctypes.byref(n),
                              err, len(err))
    if rc != 0:
        raise RuntimeError(f"pip_gop_starts failed: {err.value.decode()}")
    return [int(buf[i]) for i in range(min(n.value, cap))]


def shard_plan(data: bytes, n_shards: int) -> list[tuple[int, int, bytes]]:
    """The exact shard decomposition compress_sharded uses:
    [(start, end, sps_pps_context_bytes), ...] — whole-GOP groups,
    byte-balanced into <= n_shards shards. A multi-host driver compresses
    a disjoint subset per host (losslessh264_tpu.parallel)."""
    lib = load()
    if not hasattr(lib.pip_shard_plan_c, "_cfg"):
        lib.pip_shard_plan_c.restype = ctypes.c_int
        lib.pip_shard_plan_c.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.pip_shard_plan_c._cfg = True
    cap = 4096
    starts = (ctypes.c_uint64 * cap)()
    ends = (ctypes.c_uint64 * cap)()
    ctx_lens = (ctypes.c_uint64 * cap)()
    ctx_cap = 1 << 22
    ctx_buf = ctypes.create_string_buffer(ctx_cap)
    n = ctypes.c_size_t()
    err = ctypes.create_string_buffer(512)
    rc = lib.pip_shard_plan_c(data, len(data), n_shards, starts, ends,
                              ctx_lens, ctx_buf, ctx_cap, cap,
                              ctypes.byref(n), err, len(err))
    if rc != 0:
        raise RuntimeError(f"pip_shard_plan failed: {err.value.decode()}")
    out = []
    off = 0
    for i in range(n.value):
        clen = int(ctx_lens[i])
        out.append((int(starts[i]), int(ends[i]), ctx_buf.raw[off:off + clen]))
        off += clen
    return out


def compress(data: bytes, verify: bool = True,
             context: bytes = b"") -> tuple[bytes, Stats]:
    """Compress an Annex-B .264 stream to the .pip container format.

    context: optional SPS/PPS NAL stream absorbed for parameter-set state
    but not emitted (GOP segment / checkpoint compression)."""
    lib = load()
    if context:
        if not hasattr(lib.pip_compress_ctx_c, "_cfg"):
            lib.pip_compress_ctx_c.restype = ctypes.c_int
            lib.pip_compress_ctx_c.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(PipStats),
                ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.pip_compress_ctx_c._cfg = True
        out = ctypes.POINTER(ctypes.c_uint8)()
        out_size = ctypes.c_size_t()
        st = PipStats()
        err = ctypes.create_string_buffer(512)
        rc = lib.pip_compress_ctx_c(data, len(data), context, len(context),
                                    1 if verify else 0, ctypes.byref(out),
                                    ctypes.byref(out_size), ctypes.byref(st),
                                    err, len(err))
        if rc != 0:
            raise RuntimeError(f"pip_compress failed: {err.value.decode()}")
        try:
            return ctypes.string_at(out, out_size.value), _stats_from(st)
        finally:
            lib.pip_free(out)
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


def compress_sharded(data: bytes, n_shards: int,
                     verify: bool = False) -> tuple[bytes, Stats]:
    """GOP-sharded parallel compression (shards are model-independent —
    the multi-host distribution unit)."""
    lib = load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_size_t()
    st = PipStats()
    err = ctypes.create_string_buffer(1024)
    rc = lib.pip_compress_sharded_c(
        data, len(data), n_shards, 1 if verify else 0, ctypes.byref(out),
        ctypes.byref(out_size), ctypes.byref(st), err, len(err),
    )
    if rc != 0:
        raise RuntimeError(f"pip_compress_sharded failed: {err.value.decode()}")
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


class SymbolDecoder:
    """Streaming symbol-plane decoder: parses a .264 and yields per-frame
    numpy planes for the pixel pipeline (native/src/decsupport.cc)."""

    def __init__(self, data: bytes):
        import numpy as np  # local import; numpy optional for pip paths

        self._np = np
        lib = load()
        if not hasattr(lib.pip_sym_open, "_configured"):
            lib.pip_sym_open.restype = ctypes.c_void_p
            lib.pip_sym_open.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.pip_sym_next.restype = ctypes.c_int
            lib.pip_sym_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.pip_sym_planes.restype = ctypes.c_int
            lib.pip_sym_planes.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 31
            lib.pip_sym_close.argtypes = [ctypes.c_void_p]
            lib.pip_sym_open._configured = True
        self._lib = lib
        err = ctypes.create_string_buffer(512)
        self._h = lib.pip_sym_open(data, len(data), err, len(err))
        if not self._h:
            raise RuntimeError(f"pip_sym_open failed: {err.value.decode()}")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pip_sym_close(self._h)
            self._h = None

    def __iter__(self):
        return self

    def __next__(self):
        np = self._np
        w = ctypes.c_int()
        h = ctypes.c_int()
        err = ctypes.create_string_buffer(512)
        rc = self._lib.pip_sym_next(self._h, ctypes.byref(w), ctypes.byref(h),
                                    err, len(err))
        if rc == 0:
            raise StopIteration
        if rc < 0:
            raise RuntimeError(f"pip_sym_next failed: {err.value.decode()}")
        n = w.value * h.value
        f = {
            "mb_w": w.value,
            "mb_h": h.value,
            "mb_class": np.zeros(n, np.uint8),
            "qp": np.zeros(n, np.uint8),
            "cbp_luma": np.zeros(n, np.uint8),
            "cbp_chroma": np.zeros(n, np.uint8),
            "transform8": np.zeros(n, np.uint8),
            "i16_mode": np.zeros(n, np.uint8),
            "chroma_mode": np.zeros(n, np.uint8),
            "i4_modes": np.zeros((n, 16), np.int8),
            "luma_ac": np.zeros((n, 16, 4, 4), np.int16),
            "luma_dc": np.zeros((n, 4, 4), np.int16),
            "luma8": np.zeros((n, 4, 8, 8), np.int16),
            "chroma_ac": np.zeros((n, 8, 4, 4), np.int16),
            "chroma_dc": np.zeros((n, 2, 2, 2), np.int16),
            "mv": np.zeros((n, 16, 2), np.int16),
            "ref_frame": np.zeros((n, 16), np.int16),
            "pcm": np.zeros((n, 384), np.uint8),
            "slice_id": np.zeros(n, np.uint8),
            "deblock_idc": np.zeros(n, np.uint8),
            "alpha_off": np.zeros(n, np.int8),
            "beta_off": np.zeros(n, np.int8),
            # weighted prediction: per luma cell (w, o, log2denom); denom
            # -1 = unweighted. wp_cmask: per chroma pixel (8x8/MB), the
            # reference's quarter-size weighting region.
            "wp_luma": np.zeros((n, 16, 3), np.int16),
            "wp_cb": np.zeros((n, 16, 3), np.int16),
            "wp_cr": np.zeros((n, 16, 3), np.int16),
            "wp_cmask": np.zeros((n, 8, 8), np.uint8),
            # raw ref_idx per cell (-1 intra); deblock bS compares these
            # (reference semantics), not resolved output frames
            "ref_idx": np.zeros((n, 16), np.int8),
            "decoded": np.zeros(n, np.uint8),
            # 1 at the top-left cell of each motion partition — the
            # sample set MV-copy error concealment averages over
            # (reference GetAvilInfoFromCorrectMb)
            "part_tl": np.zeros((n, 16), np.uint8),
        }
        meta = np.zeros(12, np.int32)
        scaling = np.zeros(96 + 384, np.uint8)
        ref_list = np.zeros(19, np.int32)
        dpb_live = np.zeros(18, np.int32)
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.pip_sym_planes(
            self._h, ptr(f["mb_class"]), ptr(f["qp"]), ptr(f["cbp_luma"]),
            ptr(f["cbp_chroma"]), ptr(f["transform8"]), ptr(f["i16_mode"]),
            ptr(f["chroma_mode"]), ptr(f["i4_modes"]), ptr(f["luma_ac"]),
            ptr(f["luma_dc"]), ptr(f["luma8"]), ptr(f["chroma_ac"]),
            ptr(f["chroma_dc"]), ptr(f["mv"]), ptr(f["ref_frame"]),
            ptr(f["pcm"]), ptr(f["slice_id"]), ptr(f["deblock_idc"]),
            ptr(f["alpha_off"]), ptr(f["beta_off"]), ptr(meta), ptr(scaling),
            ptr(f["wp_luma"]), ptr(f["wp_cb"]), ptr(f["wp_cr"]),
            ptr(f["wp_cmask"]), ptr(f["ref_idx"]), ptr(f["decoded"]),
            ptr(f["part_tl"]), ptr(ref_list), ptr(dpb_live),
        )
        if rc != 0:
            raise RuntimeError("pip_sym_planes failed")
        # frame-level L0 ref list (ref_idx -> output index)
        f["ref_list"] = ref_list[1:1 + int(ref_list[0])].tolist()
        # full post-marking DPB (eviction liveness — includes long-term
        # pics outside the active L0 range; ADVICE r3)
        f["dpb_live"] = dpb_live[1:1 + int(dpb_live[0])].tolist()
        f["use_scaling"] = bool(meta[0])
        f["chroma_qp_offset"] = int(meta[1])
        f["second_chroma_qp_offset"] = int(meta[2])
        f["is_ref"] = bool(meta[3])
        f["is_idr"] = bool(meta[4])
        f["constrained_intra"] = bool(meta[5])
        # SPS frame cropping in luma samples (4:2:0 frame_mbs_only:
        # CropUnitX = CropUnitY = 2, spec 7.4.2.1.1)
        f["crop_px"] = tuple(int(meta[6 + i]) * 2 for i in range(4))
        f["lost_slices"] = int(meta[10])
        f["scaling4"] = scaling[:96].reshape(6, 16)
        f["scaling8"] = scaling[96:].reshape(6, 64)
        return f
