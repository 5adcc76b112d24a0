"""Oracle tests for the LP-CV line-profile stencil.

The oracle is an independent direct numpy evaluation of the stencil
definition (gather along precomputed line coordinates), mirroring the
semantics of neighbor2d.pyx / neighbor.pyx without reusing their code.
"""

import numpy as np
import jax.numpy as jnp

from hiprfish_tpu.ops import line_profile as lp


def numpy_line_profile_2d(image_padded, patch_size=11, phi_range=9):
    table = lp.line_table_2d(patch_size, phi_range)
    h = image_padded.shape[0] - (patch_size - 1)
    w = image_padded.shape[1] - (patch_size - 1)
    out = np.zeros((h, w, phi_range, patch_size))
    for i in range(h):
        for j in range(w):
            patch = image_padded[i : i + patch_size, j : j + patch_size]
            for t in range(phi_range):
                for li in range(patch_size):
                    out[i, j, t, li] = patch[table[t, li, 0], table[t, li, 1]]
    return out


def numpy_lp_cv_enhance_2d(image, patch_size=11, phi_range=9):
    padded = np.pad(image, (patch_size - 1) // 2, mode="edge")
    prof = numpy_line_profile_2d(padded, patch_size, phi_range)
    pmin = prof.min(axis=3, keepdims=True)
    pmax = prof.max(axis=3, keepdims=True)
    rng = np.maximum(pmax - pmin, 1e-8)
    rnc = ((prof - pmin) / rng)[:, :, :, (patch_size - 1) // 2]
    mean = rnc.mean(axis=2)
    lq = np.percentile(rnc, 25, axis=2)
    uq = np.percentile(rnc, 75, axis=2)
    qcv = np.where(uq > 0, (uq - lq) / (uq + lq + 1e-8), 0.0)
    return mean * (1 - qcv)


def test_line_table_2d_geometry():
    table = lp.line_table_2d(11, 9)
    assert table.shape == (9, 11, 2)
    assert table.min() >= 0 and table.max() <= 10
    # phi=0 is the horizontal line: row coordinate spans, col stays center.
    assert set(table[0, :, 1].tolist()) == {5}
    # Every line passes through the patch center at the center sample.
    assert np.all(table[:, 5, :] == 5)


def test_line_profile_2d_matches_oracle(rng):
    img = rng.rand(24, 20)
    padded = np.pad(img, 5, mode="edge")
    got = np.asarray(lp.line_profile_2d(jnp.asarray(padded)))
    want = numpy_line_profile_2d(padded)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lp_cv_enhance_2d_matches_oracle(rng):
    img = rng.rand(24, 20).astype(np.float32)
    got = np.asarray(lp.lp_cv_enhance_2d(jnp.asarray(img)))
    want = numpy_lp_cv_enhance_2d(img.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lp_cv_enhance_2d_highlights_ridges(rng):
    # A bright rod on dark background: interior pixels should score higher
    # than background pixels after enhancement.
    img = np.zeros((40, 40), np.float32)
    img[18:23, 8:32] = 1.0
    img += rng.rand(40, 40).astype(np.float32) * 0.01
    enh = np.asarray(lp.lp_cv_enhance_2d(jnp.asarray(img)))
    assert enh[20, 20] > enh[5, 5]
    assert enh[20, 20] > 0.5


def test_line_profile_3d_center_normalized(rng):
    vol = rng.rand(8, 9, 10)
    padded = np.pad(vol, 5, mode="edge")
    out = np.asarray(lp.line_profile_3d(jnp.asarray(padded)))
    assert out.shape == (8, 9, 10, 72)
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-5


def test_lp_cv_enhance_3d_shape(rng):
    vol = rng.rand(8, 9, 10).astype(np.float32)
    out = np.asarray(lp.lp_cv_enhance_3d(jnp.asarray(vol)))
    assert out.shape == (8, 9, 10)
    assert np.isfinite(out).all()
