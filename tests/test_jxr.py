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


# ---------------------------------------------------------------------------
# Parameter-corner hardening (round-4): the round-trip tests above prove
# self-consistency per config; these sweep the full encoder parameter grid
# and assert structural validity properties a consistent-but-wrong codec
# would still violate (DC preservation, tile-seam continuity).


def test_lossy_corner_sweep_structural():
    """Every (dtype x overlap x tiling x quantizer) corner must decode with
    the right shape/dtype, preserve the DC level (a band-assembly or
    prediction defect shifts the mean), keep a sane PSNR, and stay monotone
    in qp within each corner."""
    rng = np.random.default_rng(11)
    for dtype in (np.uint8, np.uint16):
        img = _textured((80, 112), dtype, rng,
                        noise=8 if dtype == np.uint8 else 600)
        hi = float(np.iinfo(dtype).max)
        span = float(img.max()) - float(img.min())
        # qp is a raw T.832 quantizer step on the sample scale, so the
        # grid scales with bit depth (step 20 on a 0-255 range is ~28 dB
        # by construction, not a defect)
        qps = (3, 8) if dtype == np.uint8 else (6, 20)
        for overlap in (0, 1, 2):
            for tiles in ((1, 1), (2, 2), (3, 2)):
                mses = []
                for qp in qps:
                    enc = jxr.encode(img, qp=qp, overlap=overlap,
                                     tiles=tiles)
                    dec = jxr.decode(enc)
                    assert dec.dtype == img.dtype
                    assert dec.shape == img.shape
                    err = dec.astype(np.float64) - img
                    mses.append((err ** 2).mean())
                    ctx = f"dtype={dtype} ov={overlap} t={tiles} qp={qp}"
                    assert abs(err.mean()) < 0.02 * span + 1, ctx
                    psnr = 10 * np.log10(hi ** 2 / max(mses[-1], 1e-9))
                    assert psnr > 30.0, f"{ctx}: psnr={psnr:.1f}"
                assert mses[0] <= mses[1] + 1e-9, \
                    f"qp non-monotone at ov={overlap} t={tiles}"


@pytest.mark.parametrize("overlap", [0, 1, 2])
def test_tile_seam_continuity(overlap):
    """Lossy decode of a smooth ramp must not jump at tile boundaries: a
    mis-sequenced tile index, per-tile DC offset, or an overlap filter
    wrongly run across (or not run up to) a tile edge shows up as a seam
    discontinuity that in-tile quantization noise cannot explain. Lossless
    round-trips CANNOT catch this class (encoder+decoder sharing the wrong
    convention cancels out)."""
    y, x = np.mgrid[:128, :192]
    img = (8000 + 90.0 * x + 40.0 * y
           + 500 * np.sin(x / 40.0)).astype(np.uint16)
    enc = jxr.encode(img, qp=24, overlap=overlap, tiles=(3, 2))
    dec = jxr.decode(enc).astype(np.int64)
    dx = np.abs(np.diff(dec, axis=1))       # (128, 191), step x -> x+1
    dy = np.abs(np.diff(dec, axis=0))
    # tile grid (3 cols, 2 rows) on a 192x128 canvas -> seams after
    # x=63|64 and x=127|128, y=63|64 (macroblock-aligned 64-px tiles)
    seam_x = dx[:, [63, 127]].max()
    seam_y = dy[[63], :].max()
    interior_x = np.delete(dx, [63, 127], axis=1)
    interior_y = np.delete(dy, [63], axis=0)
    assert seam_x <= 3 * interior_x.max() + 4, \
        f"x-seam jump {seam_x} vs interior max {interior_x.max()}"
    assert seam_y <= 3 * interior_y.max() + 4, \
        f"y-seam jump {seam_y} vs interior max {interior_y.max()}"


def test_golden_fixtures_when_present():
    """Bit-level validation against real-world encoders, armed the day a
    jxrlib/imagecodecs environment exists: tools/make_jxr_golden.py writes
    (stream, expected-pixels) pairs into tests/data/jxr_golden/, and this
    test decodes every pair. Skips (not passes) while the directory is
    empty so the gap stays visible in the test report."""
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    pairs = sorted(glob.glob(os.path.join(here, "data", "jxr_golden",
                                          "*.jxr")))
    if not pairs:
        pytest.skip("no golden JXR fixtures in this environment "
                    "(see tools/make_jxr_golden.py)")
    for p in pairs:
        with open(p, "rb") as f:
            raw = f.read()
        expect = np.load(p[:-4] + ".npy")
        dec = jxr.decode(raw)
        lossless = os.path.basename(p).startswith("lossless_")
        if lossless:
            np.testing.assert_array_equal(dec, expect)
        else:
            hi = float(np.iinfo(expect.dtype).max)
            mse = ((dec.astype(np.float64) - expect) ** 2).mean()
            psnr = 10 * np.log10(hi ** 2 / max(mse, 1e-9))
            assert psnr > 40.0, f"{p}: psnr vs jxrlib decode = {psnr:.1f}"
