"""JPEG XR codec (native/jxr.cc via io/jxr.py) and its CZI integration.

The reference reads JPEG XR CZIs through bioformats' bundled codec
(hiprfish_imaging_spectral_image_measurement.py:145, biofilm JVM loaders
:55-132); here the from-scratch T.832-architecture codec must make
io/czi.py's unsupported-codec raise unreachable for compression=4.
Validation strategy (no other JPEG XR implementation exists in this
environment — see the residual-risk note in io/jxr.py): bit-exact
lossless round-trips across pixel formats / sizes / overlap modes /
tile grids, monotone lossy rate-distortion, and clean failures on
corrupt input.
"""

import numpy as np
import pytest

from hiprfish_tpu.io import czi, jxr

pytestmark = pytest.mark.skipif(
    not jxr.available(), reason="native JPEG XR library not built")


def _textured(shape, dtype, rng, noise=200):
    """Smooth field + noise so every band carries signal."""
    y, x = np.mgrid[: shape[0], : shape[1]]
    hi = np.iinfo(dtype).max
    base = (np.sin(y / 9.0) * np.cos(x / 13.0) + 1.0) * 0.35 * hi
    img = base + rng.integers(0, noise, shape[:2])
    if len(shape) == 3:
        img = np.stack([np.roll(img, 7 * c, axis=1) for c in range(3)], -1)
    return np.clip(img, 0, hi).astype(dtype)


@pytest.mark.parametrize("shape,dtype,overlap", [
    ((64, 64), np.uint16, 1),
    ((48, 80), np.uint8, 0),
    ((37, 53), np.uint16, 2),      # non-multiple-of-16 extents
    ((16, 16), np.uint8, 1),       # single macroblock
    ((60, 44, 3), np.uint8, 1),    # RGB via the reversible RCT
    ((60, 44, 3), np.uint16, 2),
])
def test_lossless_roundtrip(shape, dtype, overlap):
    rng = np.random.default_rng(hash((shape, overlap)) % 2**31)
    img = _textured(shape, dtype, rng)
    enc = jxr.encode(img, qp=1, overlap=overlap)
    dec = jxr.decode(enc)
    assert dec.dtype == img.dtype
    np.testing.assert_array_equal(dec, img)


def test_info_and_container_fields():
    rng = np.random.default_rng(0)
    img = _textured((50, 70), np.uint16, rng)
    enc = jxr.encode(img)
    assert enc[:4] == b"\x49\x49\xbc\x01"        # II BC 01 container
    assert jxr.info(enc) == (70, 50, 1, 2)


@pytest.mark.parametrize("tiles", [(2, 2), (3, 1), (1, 4)])
def test_tiled_lossless(tiles):
    rng = np.random.default_rng(7)
    img = _textured((128, 160), np.uint16, rng)
    enc = jxr.encode(img, qp=1, overlap=2, tiles=tiles)
    np.testing.assert_array_equal(jxr.decode(enc), img)


def test_lossy_rate_distortion_monotone():
    rng = np.random.default_rng(1)
    img = _textured((256, 256), np.uint16, rng, noise=60)
    sizes, psnrs = [], []
    for qp in (8, 24, 72):
        enc = jxr.encode(img, qp=qp)
        dec = jxr.decode(enc).astype(np.float64)
        mse = ((dec - img) ** 2).mean()
        sizes.append(len(enc))
        psnrs.append(10 * np.log10(65535.0**2 / max(mse, 1e-9)))
    assert sizes[0] > sizes[1] > sizes[2]
    assert psnrs[0] > psnrs[1] > psnrs[2]
    assert psnrs[-1] > 45.0            # still visually clean at qp=72


def test_lossless_compresses_smooth_content():
    y, x = np.mgrid[:256, :256]
    img = (1000 + 800 * np.sin(y / 23.0) * np.cos(x / 31.0)).astype(
        np.uint16)
    enc = jxr.encode(img, qp=1)
    assert len(enc) < img.nbytes * 0.55


def test_corrupt_input_fails_cleanly():
    rng = np.random.default_rng(2)
    enc = jxr.encode(_textured((64, 64), np.uint16, rng))
    with pytest.raises(ValueError):
        jxr.decode(b"not a jxr stream at all")
    for cut in (4, 40, len(enc) // 2):
        with pytest.raises(ValueError):
            jxr.decode(enc[:cut])
    # bit flips may decode to wrong pixels but must never crash/hang
    for pos in (30, 200, len(enc) - 20):
        bad = bytearray(enc)
        bad[pos] ^= 0xFF
        try:
            out = jxr.decode(bytes(bad))
            assert out.shape == (64, 64)
        except ValueError:
            pass


def test_encode_rejects_bad_args():
    with pytest.raises(ValueError):
        jxr.encode(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        jxr.encode(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        jxr.encode(np.zeros((8, 8), np.uint8), qp=300)


def test_czi_jpegxr_end_to_end(tmp_path, rng):
    """write_czi(compression=COMP_JPEGXR) -> CziFile.load_plane round-trip
    through the auto-registered codec: the unsupported-codec raise at
    io/czi.py is unreachable for compression=4."""
    raw = (rng.rand(96, 128, 4) * 60000).astype("<u2")
    path = str(tmp_path / "jxr16.czi")
    czi.write_czi(path, raw, pixel_type=1, compression=czi.COMP_JPEGXR)
    czi._autoload_codecs()
    assert czi.COMP_JPEGXR in czi._DECOMPRESSORS
    f = czi.CziFile(path)
    try:
        got = f.load_plane()
    finally:
        f.close()
    np.testing.assert_allclose(got, raw.astype(np.float32) / 65535.0,
                               atol=1e-7)


def test_czi_jpegxr_gray8(tmp_path, rng):
    raw = (rng.rand(40, 56, 2) * 255).astype(np.uint8)
    path = str(tmp_path / "jxr8.czi")
    czi.write_czi(path, raw, pixel_type=0, compression=czi.COMP_JPEGXR)
    f = czi.CziFile(path)
    try:
        got = f.load_plane()
    finally:
        f.close()
    np.testing.assert_allclose(got, raw.astype(np.float32) / 255.0,
                               atol=1e-7)


def test_czi_jpegxr_native_threaded_assembly(tmp_path, rng):
    """The C++ thread-pool assembler (czi_native.cc) decodes compression=4
    subblocks directly — jxr.cc is linked into libczi_native.so — so
    multi-subblock JXR planes never fall back to the serial Python path."""
    from hiprfish_tpu.io import czi_native

    if czi_native.get_library() is None:
        pytest.skip("native library not built")
    raw = (rng.rand(64, 96, 3) * 60000).astype("<u2")
    path = str(tmp_path / "jxr_nat.czi")
    czi.write_czi(path, raw, pixel_type=1, compression=czi.COMP_JPEGXR)
    f = czi.CziFile(path)
    try:
        nat = czi_native.load_plane_native(f)
    finally:
        f.close()
    assert nat is not None, "native assembler fell back"
    np.testing.assert_allclose(nat, raw.astype(np.float32) / 65535.0,
                               atol=1e-7)


def test_czi_jpegxr_float_planes_rejected(tmp_path, rng):
    with pytest.raises(NotImplementedError, match="Gray8/Gray16"):
        czi.write_czi(str(tmp_path / "f.czi"),
                      rng.rand(32, 32, 1).astype(np.float32),
                      pixel_type=2, compression=czi.COMP_JPEGXR)


def test_decoder_fuzz_never_crashes():
    """Random and mutated byte streams: every outcome must be a clean
    ValueError or a successfully decoded array — never a crash, hang, or
    unbounded allocation (the decoder runs in-process over ctypes, so a
    C++ fault here would take pytest down: that is the assertion)."""
    rng = np.random.default_rng(3)
    enc = jxr.encode(_textured((48, 64), np.uint16, rng), qp=1, overlap=1)
    streams = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
               for n in (0, 1, 7, 64, 4096)]
    streams += [enc[:1], enc[:17], enc + b"\x00" * 9]
    for _ in range(60):
        bad = bytearray(enc)
        for _ in range(int(rng.integers(1, 6))):
            bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
        streams.append(bytes(bad))
    ok = err = 0
    for s in streams:
        try:
            out = jxr.decode(s)
            assert out.size > 0
            ok += 1
        except ValueError:
            err += 1
    assert ok + err == len(streams)
