"""ctypes bindings for the native CZI decoder (native/czi_native.cc).

The Python ZISRAW parser (io/czi.py) stays the source of truth for container
structure; this module offloads the hot path — subblock read + zstd decode +
type conversion + scatter into the output plane — to the C++ thread pool.
Falls back silently to the pure-Python reader when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "build", "libczi_native.so")


class _SubblockDesc(ctypes.Structure):
    _fields_ = [
        ("data_pos", ctypes.c_int64),
        ("data_size", ctypes.c_int64),
        ("y0", ctypes.c_int32),
        ("x0", ctypes.c_int32),
        ("c0", ctypes.c_int32),
        ("sy", ctypes.c_int32),
        ("sx", ctypes.c_int32),
        ("sc", ctypes.c_int32),
        ("pixel_type", ctypes.c_int32),
        ("compression", ctypes.c_int32),
    ]


def _build_library() -> bool:
    src_dir = os.path.join(_REPO_ROOT, "native")
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_library():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_SO_PATH) and not _build_library():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.czi_assemble_plane.restype = ctypes.c_int
        lib.czi_assemble_plane.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(_SubblockDesc), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32,
        ]
        lib.czi_decode_jpeg.restype = ctypes.c_int
        lib.czi_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def decode_jpeg(raw: bytes, expect_hw: tuple | None = None):
    """Decode a JPEG byte stream with the native libjpeg path.

    ``expect_hw``: optional (H, W) from the subblock directory — sizes the
    output buffer exactly. Returns (H, W) or (H, W, C) uint8, or None when
    the native library is unavailable or the stream fails to parse (caller
    falls back to PIL via the io/czi.py codec registry)."""
    import numpy as np

    lib = get_library()
    if lib is None:
        return None
    cap = (expect_hw[0] * expect_hw[1] * 4) if expect_hw else (1 << 26) * 3
    out = np.empty((cap,), np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    nc = ctypes.c_int32()
    rc = lib.czi_decode_jpeg(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc))
    if rc != 0:
        return None
    n = h.value * w.value * nc.value
    arr = out[:n].reshape(h.value, w.value, nc.value).copy()
    return arr[:, :, 0] if nc.value == 1 else arr


def _subblock_data_pos(czi_file, entry) -> tuple:
    """Absolute file offset + stored size of a subblock's pixel data.

    Returns ``None`` when the subblock headers are malformed — the caller
    then falls back to the pure-Python reader, which raises a clean
    ``ValueError`` (the C++ side must never see an unvalidated descriptor)."""
    f = czi_file._f
    f.seek(entry.file_position)
    raw = f.read(32)
    fixed = f.read(16)
    if len(raw) < 32 or len(fixed) < 16:
        return None
    _, _, used = struct.unpack("<16sqq", raw)
    meta_size, _attach, data_size = struct.unpack("<iiq", fixed)
    entry_buf = f.read(512)
    try:
        _, entry_size = czi_file._parse_directory_entry(entry_buf, 0)
    except (ValueError, struct.error, UnicodeDecodeError):
        return None
    data_offset = max(256, 16 + entry_size)
    pos = entry.file_position + 32 + data_offset + meta_size
    if meta_size < 0 or data_size < 0 \
            or pos + data_size > czi_file._file_size:
        return None
    return pos, data_size


def load_plane_native(czi_file, z: int = 0, t: int = 0, series: int = 0,
                      n_threads: int = 4):
    """Native-threaded equivalent of CziFile.load_plane. Returns None when
    the library is unavailable or a block fails (caller falls back)."""
    lib = get_library()
    if lib is None:
        return None
    entries = []
    for e in czi_file.entries:
        if e.dim_start("Z") != z and "Z" in e.dimensions:
            continue
        if e.dim_start("T") != t and "T" in e.dimensions:
            continue
        if e.dim_start("S") != series and "S" in e.dimensions:
            continue
        # pixel_type 3 (Bgr24, 3 samples/pixel) has no native decode case —
        # routing it here would pay a full failed assembly pass per plane
        # before the Python fallback. JPEG XR (4) decodes natively for
        # Gray8/Gray16 via jxr.cc linked into the same library.
        if e.compression not in (0, 1, 4, 5, 6) \
                or e.pixel_type not in (0, 1, 2, 12) \
                or (e.compression == 4 and e.pixel_type not in (0, 1)):
            return None
        entries.append(e)
    if not entries:
        raise IndexError(f"no subblocks for z={z} t={t} series={series}")
    H, W, C = czi_file.size_y, czi_file.size_x, czi_file.size_c
    descs = (_SubblockDesc * len(entries))()
    for i, e in enumerate(entries):
        ps = _subblock_data_pos(czi_file, e)
        if ps is None:
            return None  # malformed headers: pure-Python path reports it
        pos, size = ps
        y0, x0, c0 = e.dim_start("Y"), e.dim_start("X"), e.dim_start("C")
        sy, sx = e.dim_size("Y"), e.dim_size("X")
        sc = e.dim_size("C", 1)
        # The C++ writer trusts the placement; reject anything that would
        # land outside the (H, W, C) output plane.
        if min(y0, x0, c0) < 0 or y0 + sy > H or x0 + sx > W \
                or c0 + sc > C:
            return None
        descs[i] = _SubblockDesc(pos, size, y0, x0, c0, sy, sx, sc,
                                 e.pixel_type, e.compression)
    out = np.zeros((H, W, C), np.float32)
    failures = lib.czi_assemble_plane(
        czi_file.path.encode(), descs, len(entries),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.shape[0], out.shape[1], out.shape[2], n_threads)
    if failures:
        return None
    return out
