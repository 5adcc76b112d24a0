"""Zeiss CZI (ZISRAW) reader — replaces the reference's javabridge/bioformats
JVM ingestion (spectral_image_measurement.py:31: a JVM started at import
time; SURVEY.md hard-parts #3).

Implements the ZISRAW container format directly: segment stream parsing
(ZISRAWFILE header -> ZISRAWDIRECTORY -> ZISRAWSUBBLOCK), DimensionEntryDV
coordinates (X/Y/C/Z/T/S/M), uncompressed and zstd-compressed pixel data,
Gray8/Gray16/Gray32Float pixel types. Multi-channel planes are assembled
from per-channel subblocks into (Y, X, C) float arrays, matching
bioformats.load_image semantics.

A minimal spec-compliant writer (write_czi) is included for tests and for
converting arrays to CZI. JPEG/JPEG-XR compressed files are rejected with a
clear error (convert externally or use .npy).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List

import numpy as np

SEGMENT_HEADER = struct.Struct("<16sqq")

PIXEL_DTYPES = {
    0: np.dtype("uint8"),        # Gray8
    1: np.dtype("<u2"),          # Gray16
    2: np.dtype("<f4"),          # Gray32Float
    3: np.dtype("uint8"),        # Bgr24 (3 samples)
    12: np.dtype("<i4"),         # Gray32
    13: np.dtype("<f8"),         # Gray64
}
PIXEL_SAMPLES = {3: 3}

COMP_UNCOMPRESSED = 0
COMP_JPEG = 1
COMP_JPEGXR = 4
COMP_ZSTD0 = 5
COMP_ZSTD1 = 6

# Pluggable decoders for the codec compressions (JPEG / JPEG-XR). Zeiss
# confocal exports commonly use JPEG-XR, which the reference inherits from
# bioformats' bundled codec. There is no JXR implementation in this
# environment to bind against, so the reader exposes a registry: decoders
# are picked up automatically from `imagecodecs` when that package is
# importable, or can be registered explicitly with
# ``register_decompressor(COMP_JPEGXR, fn)`` where ``fn(raw, entry) ->
# np.ndarray`` returns the decoded (Y, X[, S]) array.
_DECOMPRESSORS: dict = {}


def register_decompressor(compression: int, fn) -> None:
    """Register a decoder for a CZI compression id (see module constants)."""
    _DECOMPRESSORS[compression] = fn


def _jpeg_decode_chain(raw: bytes, entry) -> np.ndarray:
    """JPEG decode: native libjpeg (threaded C++ runtime) with a PIL
    fallback — both ship in this environment, so compression=1 subblocks
    always decode (the reference reads them through bioformats' codec,
    spectral_image_measurement.py:145)."""
    from hiprfish_tpu.io import czi_native

    arr = czi_native.decode_jpeg(
        raw, (entry.dim_size("Y"), entry.dim_size("X")))
    if arr is not None:
        return arr
    import io as _io

    from PIL import Image

    return np.asarray(Image.open(_io.BytesIO(raw)))


def _autoload_codecs() -> None:
    """Wire codec decoders: imagecodecs when importable, then the native
    codecs — jxr.cc for JPEG XR, the libjpeg / PIL chain for JPEG."""
    if _DECOMPRESSORS.get("_auto"):
        return
    _DECOMPRESSORS["_auto"] = True
    try:
        import imagecodecs
    except ImportError:
        imagecodecs = None
    if imagecodecs is not None:
        if getattr(imagecodecs, "jpegxr_decode", None) is not None:
            _DECOMPRESSORS.setdefault(
                COMP_JPEGXR, lambda raw, entry: np.asarray(
                    imagecodecs.jpegxr_decode(raw)))
        if getattr(imagecodecs, "jpeg8_decode", None) is not None:
            _DECOMPRESSORS.setdefault(
                COMP_JPEG, lambda raw, entry: np.asarray(
                    imagecodecs.jpeg8_decode(raw)))
    from hiprfish_tpu.io import jxr

    if jxr.available():
        _DECOMPRESSORS.setdefault(
            COMP_JPEGXR, lambda raw, entry: jxr.decode(raw))
    _DECOMPRESSORS.setdefault(COMP_JPEG, _jpeg_decode_chain)


@dataclasses.dataclass
class DimensionEntry:
    dimension: str
    start: int
    size: int
    stored_size: int


@dataclasses.dataclass
class SubBlockEntry:
    file_position: int
    pixel_type: int
    compression: int
    dimensions: Dict[str, DimensionEntry]

    def dim_start(self, d: str, default: int = 0) -> int:
        e = self.dimensions.get(d)
        return e.start if e else default

    def dim_size(self, d: str, default: int = 1) -> int:
        e = self.dimensions.get(d)
        return e.size if e else default


class CziFile:
    """Random-access ZISRAW container.

    Malformed input (truncated files, corrupt headers/directories,
    implausible sizes) always raises ``ValueError`` — never a raw
    ``struct.error``/decode error, an unbounded allocation, or a hang.
    """

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        try:
            import os as _os

            self._file_size = _os.fstat(self._f.fileno()).st_size
            sid, _, _ = self._read_segment_header(0)
            if sid != "ZISRAWFILE":
                raise ValueError(
                    f"{path}: not a CZI file (got segment {sid!r})")
            payload = self._f.read(512)
            # FileHeaderSegment: Major, Minor, Reserved(8),
            # PrimaryFileGuid(16), FileGuid(16), FilePart,
            # DirectoryPosition(8), MetadataPosition(8), UpdatePending,
            # AttachmentDirectoryPosition(8)
            if len(payload) < 64:
                raise ValueError(f"{path}: truncated CZI file header")
            (self.major, self.minor) = struct.unpack_from("<ii", payload, 0)
            (self.directory_position,) = struct.unpack_from("<q", payload, 48)
            (self.metadata_position,) = struct.unpack_from("<q", payload, 56)
            if not 0 < self.directory_position < self._file_size:
                raise ValueError(
                    f"{path}: directory position {self.directory_position} "
                    "outside the file")
            self.entries: List[SubBlockEntry] = []
            try:
                self._parse_directory()
            except (struct.error, UnicodeDecodeError, IndexError) as e:
                raise ValueError(f"{path}: corrupt CZI directory ({e})")
            # Plausibility: the assembled plane is bounded by the bytes
            # actually present in the file (allowing generous compression),
            # so one corrupt dimension size can't demand a 500 GiB buffer.
            plane_cells = self.size_y * self.size_x * self.size_c
            if plane_cells * 4 > max(256 * self._file_size, 1 << 31):
                raise ValueError(
                    f"{path}: directory declares a "
                    f"{self.size_y}x{self.size_x}x{self.size_c} plane — "
                    f"implausible for a {self._file_size}-byte file")
        except BaseException:
            self._f.close()
            raise

    # -- low-level ----------------------------------------------------------

    def _read_segment_header(self, pos: int):
        self._f.seek(pos)
        raw = self._f.read(SEGMENT_HEADER.size)
        if len(raw) < SEGMENT_HEADER.size:
            raise ValueError(f"{self.path}: truncated segment header at "
                             f"offset {pos}")
        sid, allocated, used = SEGMENT_HEADER.unpack(raw)
        try:
            name = sid.rstrip(b"\x00").decode("ascii")
        except UnicodeDecodeError:
            raise ValueError(
                f"{self.path}: corrupt segment id at offset {pos}")
        return name, allocated, used

    @staticmethod
    def _parse_directory_entry(buf: bytes, off: int):
        schema = buf[off:off + 2]
        if schema != b"DV":
            raise ValueError(f"unsupported directory entry schema {schema!r}")
        (pixel_type,) = struct.unpack_from("<i", buf, off + 2)
        (file_position,) = struct.unpack_from("<q", buf, off + 6)
        (compression,) = struct.unpack_from("<i", buf, off + 18)
        (dim_count,) = struct.unpack_from("<i", buf, off + 28)
        if not 0 <= dim_count <= 24:  # ZISRAW defines ~12 dimension ids
            raise ValueError(f"implausible dimension count {dim_count}")
        if file_position < 0:
            raise ValueError(f"negative subblock position {file_position}")
        dims: Dict[str, DimensionEntry] = {}
        p = off + 32
        for _ in range(dim_count):
            dname = buf[p:p + 4].rstrip(b"\x00").decode("ascii")
            start, size, _startf, stored = struct.unpack_from("<iifi", buf, p + 4)
            if size <= 0 or (stored and stored < 0):
                raise ValueError(
                    f"non-positive extent {size}/{stored} for dim {dname!r}")
            dims[dname] = DimensionEntry(dname, start, size, stored or size)
            p += 20
        entry = SubBlockEntry(file_position, pixel_type, compression, dims)
        return entry, p - off

    def _parse_directory(self):
        sid, _, used = self._read_segment_header(self.directory_position)
        if sid != "ZISRAWDIRECTORY":
            raise ValueError(f"bad directory segment {sid!r}")
        buf = self._f.read(used)
        if len(buf) < 128:
            raise ValueError(f"{self.path}: truncated CZI directory")
        (count,) = struct.unpack_from("<i", buf, 0)
        if not 0 <= count <= (len(buf) - 128) // 32:
            raise ValueError(
                f"{self.path}: directory claims {count} entries in "
                f"{len(buf)} bytes")
        p = 128  # entry table starts after the 128-byte directory header
        for _ in range(count):
            entry, consumed = self._parse_directory_entry(buf, p)
            self.entries.append(entry)
            p += consumed

    # -- metadata -----------------------------------------------------------

    @property
    def metadata_xml(self) -> str:
        if not 0 < self.metadata_position < self._file_size:
            return ""
        try:
            sid, _, used = self._read_segment_header(self.metadata_position)
        except ValueError:
            return ""
        if sid != "ZISRAWMETADATA":
            return ""
        buf = self._f.read(used)
        if len(buf) < 260:
            return ""
        (xml_size,) = struct.unpack_from("<i", buf, 0)
        return buf[256:256 + max(xml_size, 0)].decode("utf-8", "replace")

    @property
    def pixel_size_um(self):
        """Lateral pixel size in µm from the Scaling metadata block
        (<Distance Id="X"><Value> is meters in Zeiss XML), or None.
        The reference hard-codes 0.0675 µm in its figure scale bars
        (biofilm_analysis.py:245); this lets callers use the file's own
        calibration when present."""
        return pixel_size_um(self.metadata_xml)

    def _dim_extent(self, d: str) -> int:
        hi = 0
        for e in self.entries:
            de = e.dimensions.get(d)
            if de:
                hi = max(hi, de.start + de.size)
        return max(hi, 1)

    @property
    def size_x(self) -> int:
        return self._dim_extent("X")

    @property
    def size_y(self) -> int:
        return self._dim_extent("Y")

    @property
    def size_c(self) -> int:
        return self._dim_extent("C")

    @property
    def size_z(self) -> int:
        return self._dim_extent("Z")

    @property
    def size_t(self) -> int:
        return self._dim_extent("T")

    @property
    def n_series(self) -> int:
        return self._dim_extent("S")

    # -- pixel data ----------------------------------------------------------

    def _read_subblock(self, entry: SubBlockEntry) -> np.ndarray:
        sid, _, _ = self._read_segment_header(entry.file_position)
        if sid != "ZISRAWSUBBLOCK":
            raise ValueError(f"bad subblock segment {sid!r}")
        fixed = self._f.read(16)
        if len(fixed) < 16:
            raise ValueError(f"{self.path}: truncated subblock header")
        meta_size, attach_size, data_size = struct.unpack("<iiq", fixed)
        if meta_size < 0 or data_size < 0 \
                or entry.file_position + data_size > self._file_size:
            raise ValueError(
                f"{self.path}: subblock at {entry.file_position} claims "
                f"{data_size} data bytes / {meta_size} metadata bytes")
        # Directory entry copy follows; data starts at
        # max(256, 16 + entry_size) bytes into the segment payload.
        entry_buf = self._f.read(512)
        try:
            _, entry_size = self._parse_directory_entry(entry_buf, 0)
        except (struct.error, UnicodeDecodeError) as e:
            raise ValueError(f"{self.path}: corrupt subblock entry ({e})")
        data_offset = max(256, 16 + entry_size)
        self._f.seek(entry.file_position + SEGMENT_HEADER.size + data_offset
                     + meta_size)
        raw = self._f.read(data_size)
        if len(raw) < data_size:
            raise ValueError(f"{self.path}: truncated subblock data")
        # Decompressed payload can never exceed the declared plane extent;
        # bound the expansion so corrupt zstd frames can't demand gigabytes.
        plane_bytes = (entry.dim_size("Y") * entry.dim_size("X")
                       * entry.dim_size("C", 1)
                       * max(PIXEL_SAMPLES.get(entry.pixel_type, 1), 1)
                       * 8)
        if entry.compression in (COMP_ZSTD0, COMP_ZSTD1):
            import zstandard

            if entry.compression == COMP_ZSTD1:
                # zstd1 prepends a small header: size byte + fields
                if not raw:
                    raise ValueError(
                        f"{self.path}: empty zstd1 payload")
                raw = raw[1 + raw[0]:]
            try:
                # When the frame header declares its content size,
                # python-zstandard allocates that much regardless of
                # max_output_size — check the declaration first so a
                # corrupt/hostile frame can't demand an arbitrary buffer.
                declared = zstandard.frame_content_size(raw)
                if declared > plane_bytes:
                    raise ValueError(
                        f"{self.path}: zstd subblock declares {declared} "
                        f"bytes for a {plane_bytes}-byte plane")
                raw = zstandard.ZstdDecompressor().decompress(
                    raw, max_output_size=plane_bytes)
            except zstandard.ZstdError as e:
                raise ValueError(
                    f"{self.path}: corrupt zstd subblock ({e})")
            if len(raw) > plane_bytes:
                raise ValueError(
                    f"{self.path}: zstd subblock inflates past the "
                    "declared plane")
        elif entry.compression != COMP_UNCOMPRESSED:
            _autoload_codecs()
            decoder = _DECOMPRESSORS.get(entry.compression)
            if decoder is None:
                raise NotImplementedError(
                    f"CZI compression {entry.compression} (JPEG/JPEG-XR) "
                    "needs a codec: install `imagecodecs` (auto-detected) or "
                    "register one with hiprfish_tpu.io.czi."
                    "register_decompressor; otherwise re-export "
                    "uncompressed/zstd or convert to .npy")
            decoded = np.asarray(decoder(raw, entry))
            sy = entry.dim_size("Y")
            sx = entry.dim_size("X")
            sc = entry.dim_size("C", 1)
            if decoded.ndim == 3 and decoded.shape[2] > 1 and sc == 1:
                return decoded  # multi-sample plane (Y, X, S)
            return decoded.reshape(sy, sx, sc)[..., 0] if sc == 1 \
                else decoded.reshape(sc, sy, sx).transpose(1, 2, 0)
        dtype = PIXEL_DTYPES.get(entry.pixel_type)
        if dtype is None:
            raise NotImplementedError(f"CZI pixel type {entry.pixel_type}")
        samples = PIXEL_SAMPLES.get(entry.pixel_type, 1)
        sy = entry.dim_size("Y")
        sx = entry.dim_size("X")
        sc = entry.dim_size("C", 1)
        need = sy * sx * sc * samples * dtype.itemsize
        if len(raw) < need:
            raise ValueError(
                f"{self.path}: subblock holds {len(raw)} bytes for a "
                f"{sy}x{sx}x{sc} plane needing {need}")
        arr = np.frombuffer(raw[:need], dtype)
        if samples > 1:
            return arr.reshape(sy, sx, samples)
        if sc > 1:
            return arr.reshape(sc, sy, sx).transpose(1, 2, 0)
        return arr.reshape(sy, sx)

    def load_plane(self, z: int = 0, t: int = 0, series: int = 0,
                   dtype=np.float32) -> np.ndarray:
        """(Y, X, C) plane at the given Z/T/Scene — bioformats.load_image
        semantics (normalized to [0, 1] for integer types).

        Uses the native threaded decoder (io/czi_native.py) when built,
        falling back to the pure-Python path."""
        if dtype == np.float32:
            from hiprfish_tpu.io import czi_native

            native = czi_native.load_plane_native(self, z, t, series)
            if native is not None:
                return native
        out = np.zeros((self.size_y, self.size_x, self.size_c), dtype)
        hit = False
        for e in self.entries:
            if e.dim_start("Z") != z and "Z" in e.dimensions:
                continue
            if e.dim_start("T") != t and "T" in e.dimensions:
                continue
            if e.dim_start("S") != series and "S" in e.dimensions:
                continue
            block = self._read_subblock(e).astype(dtype)
            if np.issubdtype(PIXEL_DTYPES[e.pixel_type], np.integer):
                block /= float(np.iinfo(PIXEL_DTYPES[e.pixel_type]).max)
            y0, x0 = e.dim_start("Y"), e.dim_start("X")
            c0 = e.dim_start("C")
            if y0 < 0 or x0 < 0 or c0 < 0:
                raise ValueError(
                    f"{self.path}: negative subblock origin "
                    f"({y0}, {x0}, {c0}) — normalize stage coordinates "
                    "before writing")
            sy, sx = block.shape[0], block.shape[1]
            if block.ndim == 2:
                out[y0:y0 + sy, x0:x0 + sx, c0] = block
            else:
                out[y0:y0 + sy, x0:x0 + sx, c0:c0 + block.shape[2]] = block
            hit = True
        if not hit:
            raise IndexError(f"no subblocks for z={z} t={t} series={series}")
        return out

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


# ---------------------------------------------------------------------------
# Minimal writer (tests / array -> CZI conversion)
# ---------------------------------------------------------------------------


def write_czi(path: str, planes: np.ndarray, pixel_type: int = 2,
              metadata_xml: str = "<ImageDocument/>",
              compression: int = COMP_UNCOMPRESSED,
              compressor=None) -> None:
    """Write a (Z, T, C, Y, X)-indexable array as a CZI.

    ``planes``: array of shape (Y, X, C) or (Z, Y, X, C) or (T, Z, Y, X, C).
    ``compression``: COMP_UNCOMPRESSED, COMP_ZSTD0, and — for Gray8/Gray16
    pixel types — COMP_JPEGXR are handled natively (JPEG XR through
    native/jxr.cc; pass ``jxr_qp``/``jxr_overlap`` through ``compressor``
    by giving a callable instead). Any other id requires ``compressor``,
    a per-plane encoder (the read side resolves the matching decoder
    through the register_decompressor registry / imagecodecs). A plane
    compressor may take the raw bytes OR the 2-D plane array: callables
    with a ``wants_array`` attribute set truthy receive the array.
    """
    arr = np.asarray(planes)
    if arr.ndim == 3:
        arr = arr[None, None]  # (T=1, Z=1, Y, X, C)
    elif arr.ndim == 4:
        arr = arr[None]
    nt, nz, ny, nx, nc = arr.shape
    dtype = PIXEL_DTYPES[pixel_type]

    segments = []  # (id, payload bytes)
    subblock_positions = []
    directory_entries = []

    def dim_entry(name, start, size):
        return name.encode().ljust(4, b"\x00") + struct.pack(
            "<iifi", start, size, float(start), size)

    def dir_entry(pos, t, z, c):
        dims = (dim_entry("X", 0, nx) + dim_entry("Y", 0, ny)
                + dim_entry("C", c, 1) + dim_entry("Z", z, 1)
                + dim_entry("T", t, 1))
        return (b"DV" + struct.pack("<i", pixel_type)
                + struct.pack("<q", pos) + struct.pack("<i", 0)
                + struct.pack("<i", compression)
                + b"\x00" * 6 + struct.pack("<i", 5) + dims)

    # Build the byte stream: file header first (fixed 512-byte payload).
    out = bytearray()

    def add_segment(sid: bytes, payload: bytes, min_payload: int = 0):
        pad = max(0, min_payload - len(payload))
        payload = payload + b"\x00" * pad
        # Align allocated size to 32 bytes.
        alloc = (len(payload) + 31) // 32 * 32
        pos = len(out)
        out.extend(SEGMENT_HEADER.pack(sid.ljust(16, b"\x00"), alloc,
                                       len(payload)))
        out.extend(payload)
        out.extend(b"\x00" * (alloc - len(payload)))
        return pos

    # Reserve the file header; fill after positions are known.
    header_pos = add_segment(b"ZISRAWFILE", b"\x00" * 512)

    # Metadata segment.
    xml = metadata_xml.encode()
    meta_payload = struct.pack("<ii", len(xml), 0) + b"\x00" * 248 + xml
    metadata_position = add_segment(b"ZISRAWMETADATA", meta_payload)

    # Subblocks.
    for t in range(nt):
        for z in range(nz):
            for c in range(nc):
                plane = np.ascontiguousarray(arr[t, z, :, :, c], dtype)
                data = plane.tobytes()
                if compression == COMP_ZSTD0:
                    import zstandard

                    data = zstandard.ZstdCompressor().compress(data)
                elif compressor is not None:
                    data = (compressor(plane)
                            if getattr(compressor, "wants_array", False)
                            else compressor(data))
                elif compression == COMP_JPEGXR:
                    from hiprfish_tpu.io import jxr

                    if dtype not in (np.dtype("uint8"), np.dtype("<u2")):
                        raise NotImplementedError(
                            "JPEG XR planes must be Gray8/Gray16 "
                            f"(pixel_type {pixel_type} is {dtype})")
                    if not jxr.available():
                        raise NotImplementedError(
                            "native JPEG XR library not built; pass a "
                            "`compressor` callable")
                    data = jxr.encode(plane)
                elif compression != COMP_UNCOMPRESSED:
                    raise NotImplementedError(
                        f"writing compression {compression} needs a "
                        "`compressor` callable")
                entry = dir_entry(0, t, z, c)  # position fixed below
                data_offset = max(256, 16 + len(entry))
                payload = (struct.pack("<iiq", 0, 0, len(data)) + entry
                           + b"\x00" * (data_offset - 16 - len(entry)) + data)
                pos = add_segment(b"ZISRAWSUBBLOCK", payload)
                subblock_positions.append(pos)
                directory_entries.append((pos, t, z, c))

    # Directory.
    dir_payload = struct.pack("<i", len(directory_entries)) + b"\x00" * 124
    dir_payload += b"".join(
        dir_entry(pos, t, z, c) for pos, t, z, c in directory_entries)
    directory_position = add_segment(b"ZISRAWDIRECTORY", dir_payload)

    # Fill the file header payload.
    header = bytearray(512)
    struct.pack_into("<ii", header, 0, 1, 0)                 # version
    struct.pack_into("<q", header, 48, directory_position)   # dir pos
    struct.pack_into("<q", header, 56, metadata_position)    # metadata pos
    out[header_pos + SEGMENT_HEADER.size:
        header_pos + SEGMENT_HEADER.size + 512] = header

    with open(path, "wb") as f:
        f.write(out)


def pixel_size_um(metadata_xml: str):
    """Parse the lateral pixel size (µm) out of Zeiss Scaling XML.

    Zeiss metadata stores <Scaling><Items><Distance Id="X"><Value>V
    with V in meters. Returns None when the XML has no parseable X
    scaling (callers then fall back to the reference's hard-coded
    0.0675 µm, biofilm_analysis.py:245)."""
    if not metadata_xml:
        return None
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(metadata_xml)
    except ET.ParseError:
        return None
    for dist in root.iter("Distance"):
        if dist.get("Id") != "X":
            continue
        val = dist.findtext("Value")
        if val is None:
            continue
        try:
            meters = float(val)
        except ValueError:
            continue
        if meters > 0:
            return meters * 1e6
    return None
