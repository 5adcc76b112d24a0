"""JPEG XR codec bindings (native/jxr.cc) for CZI compression=4 subblocks.

The reference reads JPEG XR-compressed CZIs transparently through
bioformats' bundled codec (JVM loaders,
hiprfish-image-analysis-biofilm/hiprfish_imaging_biofilm_analysis.py:55-132;
hiprfish-image-analysis-ecoli/hiprfish_imaging_spectral_image_measurement.py:145).
This module binds the from-scratch native T.832-architecture codec and is
auto-registered by hiprfish_tpu.io.czi for compression id 4; it also
serves as the write-side encoder for ``czi.write_czi(...,
compression=COMP_JPEGXR)``.

RESIDUAL RISK (also in PARITY.md): no JPEG XR implementation, golden
file, or network egress exists in this build environment, so the codec's
VLC tables and overlap-lifting rounding could not be validated bit-level
against jxrlib/bioformats output. Container, codestream headers, band
structure, transforms, prediction, and adaptation follow the T.832
architecture; encode->decode round-trips are bit-exact lossless (qp<=1)
and covered by tests/test_jxr.py. A third-party (e.g. Zeiss) stream will
parse and decode through the full pipeline but bit-exact pixel recovery
is NOT claimed; on any structural mismatch the decoder fails with a
clean error and the CZI reader reports the unsupported compression.
"""

from __future__ import annotations

import ctypes

import numpy as np

from hiprfish_tpu.io import czi_native

_ERRORS = {
    -1: "truncated JPEG XR stream",
    -2: "not a JPEG XR container/codestream",
    -3: "valid JPEG XR but outside the supported subset "
        "(frequency mode / alpha / windowing / subsampled chroma / "
        "float depths)",
    -4: "corrupt JPEG XR stream",
    -5: "output buffer too small",
    -6: "bad encode arguments",
}

_LIB = None
_LIB_TRIED = False


def _load():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    import os

    so = os.path.join(os.path.dirname(czi_native._SO_PATH), "libjxr.so")
    if not os.path.exists(so) and not czi_native._build_library():
        return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.jxr_decode.restype = ctypes.c_int
        lib.jxr_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64, u8p,
                                   ctypes.c_int64, i32p, i32p, i32p, i32p]
        lib.jxr_info.restype = ctypes.c_int
        lib.jxr_info.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                 i32p, i32p, i32p, i32p]
        lib.jxr_encode.restype = ctypes.c_int64
        lib.jxr_encode.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32,
                                   ctypes.c_int32, ctypes.c_int32,
                                   ctypes.c_int32, ctypes.c_int32,
                                   ctypes.c_int32, ctypes.c_int32,
                                   u8p, ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    """True when the native codec library is built and loadable."""
    return _load() is not None


def info(raw: bytes) -> tuple:
    """(width, height, channels, bytes_per_sample) from the headers."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native JPEG XR library unavailable")
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    nc = ctypes.c_int32()
    bps = ctypes.c_int32()
    rc = lib.jxr_info(raw, len(raw), ctypes.byref(w), ctypes.byref(h),
                      ctypes.byref(nc), ctypes.byref(bps))
    if rc != 0:
        raise ValueError(_ERRORS.get(rc, f"JPEG XR error {rc}"))
    return w.value, h.value, nc.value, bps.value


def decode(raw: bytes) -> np.ndarray:
    """Decode a JPEG XR payload to (H, W) or (H, W, 3) uint8/uint16."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native JPEG XR library unavailable")
    w0, h0, nc0, bps0 = info(raw)
    out = np.empty(h0 * w0 * nc0 * bps0, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    nc = ctypes.c_int32()
    bps = ctypes.c_int32()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.jxr_decode(raw, len(raw), out.ctypes.data_as(u8p), out.size,
                        ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc),
                        ctypes.byref(bps))
    if rc != 0:
        raise ValueError(_ERRORS.get(rc, f"JPEG XR error {rc}"))
    dtype = np.dtype("<u2") if bps.value == 2 else np.dtype("u1")
    arr = out.view(dtype).reshape(h.value, w.value, nc.value)
    return arr[:, :, 0] if nc.value == 1 else arr


def encode(arr: np.ndarray, qp: int = 1, overlap: int = 1,
           tiles: tuple = (1, 1)) -> bytes:
    """Encode (H, W) or (H, W, 3) uint8/uint16 to a JPEG XR container.

    ``qp`` is the T.832 quantizer index for all bands: <=1 is lossless,
    larger is lossier. ``overlap`` is OVERLAP_MODE 0/1/2. ``tiles`` is
    the (columns, rows) tile grid (clamped to the macroblock grid).
    """
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"expected (H, W[, 1|3]) array, got {arr.shape}")
    if a.dtype == np.uint8:
        bps = 1
    elif a.dtype == np.uint16:
        bps = 2
    else:
        raise ValueError(f"expected uint8/uint16 samples, got {a.dtype}")
    lib = _load()
    if lib is None:
        raise RuntimeError("native JPEG XR library unavailable")
    a = np.ascontiguousarray(a)
    h, w, nc = a.shape
    cap = a.nbytes * 2 + (1 << 16)
    out = np.empty(cap, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n = lib.jxr_encode(a.ctypes.data_as(u8p), w, h, nc, bps, int(qp),
                       int(overlap), int(tiles[0]), int(tiles[1]),
                       out.ctypes.data_as(u8p), cap)
    if n < 0:
        raise ValueError(_ERRORS.get(n, f"JPEG XR error {n}"))
    return out[:n].tobytes()
