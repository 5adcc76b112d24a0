"""Oracle tests: kmeans vs sklearn, CCL vs scipy.ndimage, watershed vs
scipy/cv2 behavior on fixtures, regionprops vs direct moments, registration
recovering known shifts, morphology vs scipy.ndimage."""

import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from hiprfish_tpu.ops import (
    kmeans,
    labeling,
    morphology,
    regionprops,
    register,
    watershed,
)


# --------------------------------------------------------------------- kmeans
def test_kmeans1d_matches_sklearn_two_well_separated(rng):
    from sklearn.cluster import KMeans

    vals = np.concatenate(
        [rng.normal(0.1, 0.02, 4000), rng.normal(0.8, 0.05, 1000)]
    ).astype(np.float32)
    ours, centers = kmeans.kmeans1d(jnp.asarray(vals), 2)
    ours = np.asarray(ours)
    sk = KMeans(n_clusters=2, random_state=0, n_init=10).fit_predict(
        vals.reshape(-1, 1)
    )
    # Compare partitions up to label permutation.
    agree = max(np.mean(ours == sk), np.mean(ours == 1 - sk))
    assert agree > 0.999
    assert centers[0] < centers[1]


def test_kmeans1d_subsampled_large_input(rng):
    """Inputs past the 2^19 histogram cap take the contiguous-block
    subsample path (ops/kmeans._value_histogram); centers must still match
    the full-data solution on a well-separated mixture."""
    n = (1 << 19) * 3 + 789          # > cap, not a multiple of the block
    vals = np.concatenate(
        [rng.normal(0.12, 0.02, (2 * n) // 3),
         rng.normal(0.85, 0.05, n - (2 * n) // 3)]
    ).astype(np.float32)
    rng.shuffle(vals)
    centers = np.asarray(kmeans.kmeans1d_centers(jnp.asarray(vals), 2))
    np.testing.assert_allclose(centers, [0.12, 0.85], atol=0.01)
    # the brightest-cluster mask threshold is the center midpoint; check it
    # splits the mixture where the full-data KMeans would
    mask = np.asarray(kmeans.brightest_cluster_mask(jnp.asarray(vals), 2))
    assert abs(mask.mean() - 1 / 3) < 0.01


def test_kmeans1d_three_clusters(rng):
    vals = np.concatenate(
        [rng.normal(m, 0.02, 1000) for m in (0.1, 0.5, 0.9)]
    ).astype(np.float32)
    labels, centers = kmeans.kmeans1d(jnp.asarray(vals), 3)
    centers = np.asarray(centers)
    np.testing.assert_allclose(centers, [0.1, 0.5, 0.9], atol=0.02)


# ------------------------------------------------------------------- labeling
def test_label_matches_scipy(rng):
    mask = rng.rand(64, 64) > 0.7
    ours, n_ours = labeling.relabel_sequential(labeling.label(jnp.asarray(mask), 1))
    ours = np.asarray(ours)
    want, n_want = ndi.label(mask)
    assert int(n_ours) == n_want
    # Same partition: bijection between label ids.
    pairs = set(zip(ours[mask].tolist(), want[mask].tolist()))
    assert len(pairs) == n_want


def test_label_full_connectivity(rng):
    mask = np.zeros((16, 16), bool)
    mask[2, 2] = True
    mask[3, 3] = True  # diagonal touch
    l1 = np.asarray(labeling.relabel_sequential(labeling.label(jnp.asarray(mask), 1))[0])
    l2 = np.asarray(labeling.relabel_sequential(labeling.label(jnp.asarray(mask), 2))[0])
    assert l1[2, 2] != l1[3, 3]
    assert l2[2, 2] == l2[3, 3]


def test_clear_border():
    m = np.zeros((16, 16), bool)
    m[0:3, 5:8] = True   # touches border
    m[8:11, 8:11] = True # interior
    lbl = labeling.label(jnp.asarray(m), 1)
    out = np.asarray(labeling.clear_border(lbl))
    assert out[1, 6] == 0
    assert out[9, 9] > 0


def test_remove_small_objects():
    m = np.zeros((16, 16), bool)
    m[2:4, 2:4] = True    # 4 px
    m[8:13, 8:13] = True  # 25 px
    out = np.asarray(labeling.remove_small_objects(jnp.asarray(m), 10))
    assert not out[2, 2]
    assert out[9, 9]


# ----------------------------------------------------------------- morphology
def test_erosion_dilation_match_scipy(rng):
    m = rng.rand(32, 32) > 0.5
    er = np.asarray(morphology.binary_erosion(jnp.asarray(m)))
    want = ndi.binary_erosion(m, border_value=1)
    np.testing.assert_array_equal(er, want)
    di = np.asarray(morphology.binary_dilation(jnp.asarray(m)))
    want = ndi.binary_dilation(m, border_value=0)
    np.testing.assert_array_equal(di, want)


def test_fill_holes_matches_scipy(rng):
    m = rng.rand(48, 48) > 0.4
    got = np.asarray(morphology.binary_fill_holes(jnp.asarray(m)))
    want = ndi.binary_fill_holes(m)
    np.testing.assert_array_equal(got, want)


def test_disk_dilation_matches_scipy():
    m = np.zeros((64, 64), bool)
    m[30, 30] = True
    got = np.asarray(morphology.binary_dilation_disk(jnp.asarray(m), 10))
    want = ndi.binary_dilation(m, structure=morphology.disk_kernel(10).astype(bool))
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------- registration
def test_register_translation_recovers_shift(rng):
    base = ndi.gaussian_filter(rng.rand(128, 128), 3)
    moved = np.roll(base, (7, -5), axis=(0, 1))
    s = np.asarray(register.register_translation(jnp.asarray(base), jnp.asarray(moved)))
    shifted, mask = register.apply_shift_2d(jnp.asarray(moved)[..., None], jnp.asarray(s))
    err = np.abs(np.asarray(shifted)[..., 0] - base)[np.asarray(mask)]
    assert err.max() < 1e-5


def test_register_clamp():
    s = np.asarray(register.clamp_shift(jnp.asarray([20.0, -3.0]), 15.0))
    np.testing.assert_allclose(s, [0.0, -3.0])


# ------------------------------------------------------------------ watershed
def test_watershed_two_basins():
    surf = np.zeros((32, 32), np.float32)
    surf[:, 16] = 1.0  # ridge
    markers = np.zeros((32, 32), np.int32)
    markers[16, 4] = 1
    markers[16, 28] = 2
    out = np.asarray(
        watershed.watershed(jnp.asarray(surf), jnp.asarray(markers), None)
    )
    assert (out[:, :16] == 1).all()
    assert (out[:, 17:] == 2).all()


def test_watershed_respects_mask():
    surf = np.zeros((16, 16), np.float32)
    markers = np.zeros((16, 16), np.int32)
    markers[8, 8] = 1
    mask = np.zeros((16, 16), bool)
    mask[4:12, 4:12] = True
    out = np.asarray(
        watershed.watershed(jnp.asarray(surf), jnp.asarray(markers), jnp.asarray(mask))
    )
    assert (out[mask] == 1).all()
    assert (out[~mask] == 0).all()


def test_watershed_splits_touching_cells_at_the_saddle(rng):
    # Two touching bright blobs flooded from their peaks on -intensity must
    # split at the symmetric saddle (x = 24), the canonical watershed answer.
    img = np.zeros((48, 48), np.float32)
    yy, xx = np.mgrid[:48, :48]
    img += np.exp(-(((yy - 24) ** 2 + (xx - 16) ** 2) / 40.0))
    img += np.exp(-(((yy - 24) ** 2 + (xx - 32) ** 2) / 40.0))
    mask = img > 0.2
    markers = np.zeros((48, 48), np.int32)
    markers[24, 16] = 1
    markers[24, 32] = 2
    ours = np.asarray(
        watershed.watershed(jnp.asarray(-img), jnp.asarray(markers), jnp.asarray(mask))
    )
    assert (ours[mask] > 0).all()
    assert (ours[mask & (xx <= 23)] == 1).all()
    assert (ours[mask & (xx >= 25)] == 2).all()


# ---------------------------------------------------------------- regionprops
def test_mean_intensities_matches_direct(rng):
    labels = np.zeros((32, 32), np.int32)
    labels[4:10, 4:10] = 1
    labels[20:30, 18:25] = 2
    img = rng.rand(32, 32, 7).astype(np.float32)
    got = np.asarray(regionprops.mean_intensities(jnp.asarray(labels), jnp.asarray(img), 4))
    for lab in (1, 2):
        want = img[labels == lab].mean(axis=0)
        np.testing.assert_allclose(got[lab], want, rtol=1e-5)


def test_shape_props_ellipse():
    # Axis-aligned solid rectangle 10x30: skimage-style axis lengths are
    # 4*sqrt(second central moments); for a W x L rectangle major ~ L/sqrt(3)*2.
    labels = np.zeros((64, 64), np.int32)
    labels[10:20, 10:40] = 1
    p = {k: np.asarray(v) for k, v in regionprops.shape_props_2d(jnp.asarray(labels), 4).items()}
    assert abs(p["area"][1] - 300) < 1e-3
    np.testing.assert_allclose(p["centroid_r"][1], 14.5, atol=1e-4)
    np.testing.assert_allclose(p["centroid_c"][1], 24.5, atol=1e-4)
    # mu for uniform rectangle of extent n: (n^2-1)/12 + 1/12 = n^2/12
    np.testing.assert_allclose(p["major_axis_length"][1], 4 * np.sqrt(30 ** 2 / 12), rtol=1e-3)
    np.testing.assert_allclose(p["minor_axis_length"][1], 4 * np.sqrt(10 ** 2 / 12), rtol=1e-3)
    # Major axis along columns => orientation +-pi/2 (skimage convention).
    assert abs(abs(p["orientation"][1]) - np.pi / 2) < 1e-3


def test_label_overlap_any():
    labels = np.zeros((16, 16), np.int32)
    labels[2:5, 2:5] = 1
    labels[10:13, 10:13] = 2
    mask = np.zeros((16, 16), bool)
    mask[11, 11] = True
    hit = np.asarray(regionprops.label_overlap_any(jnp.asarray(labels), jnp.asarray(mask), 4))
    assert not hit[1] and hit[2]


def test_fill_holes_hierarchical_path_exact(rng):
    """binary_fill_holes above the two-level flood threshold (2^22 px) must
    stay exactly scipy-equivalent (the coarse phase may only add valid
    seeds, never change the fixed point)."""
    from scipy import ndimage as ndi
    import jax.numpy as jnp
    from hiprfish_tpu.ops import morphology as morph

    m = rng.rand(2100, 2100) < 0.4
    m = ndi.binary_closing(m)
    ours = np.asarray(morph.binary_fill_holes(jnp.asarray(m), 1))
    ref = ndi.binary_fill_holes(m)
    assert np.array_equal(ours, ref)
