"""Reference-implementation oracle for parity testing.

The parity budget (BASELINE.md: per-cell barcode calls within 0.5% of the
reference) requires executing the reference's own algorithms on shared
inputs. The reference's code cannot be imported directly in this
environment — it depends on skimage, Cython (its generated C targets the
removed Python 3.5 C-API), numba and umap-learn, none of which are installed
and none of which may be installed (no package installation permitted). This
package is the closest executable stand-in, built to the letter of the
reference sources:

* ``skim``      — the exact subset of scikit-image used by the reference
                  (watershed priority-flood, morphology with skimage border
                  semantics, regionprops moments, fast-mode NL-means,
                  phase-correlation registration), re-implemented in
                  numpy/scipy from skimage's documented algorithms.
* ``lp2d``      — the Cython ``line_profile_2d_v2`` stencil
                  (neighbor2d.pyx:8-64) re-derived in numpy.
* ``pipelines`` — line-for-line transcriptions of the reference's
                  ``segment_images`` (hiprfish-image-analysis-ecoli/
                  hiprfish_imaging_spectral_image_measurement.py:44-127) and
                  ``generate_2d_segmentation`` (hiprfish-image-analysis-
                  synthetic-community/hiprfish_imaging_multispecies_spectral_
                  image_measurement.py:78-159), calling the *same sklearn
                  KMeans(random_state=0)* the reference calls.
* ``classify``  — the reference's classification stack with sklearn
                  ``svm.SVC(C=10, gamma=0.5)`` check heads (the same library
                  call, train_reference.py:1513-1517) and, in place of the
                  un-installable ``umap.UMAP(metric=channel_cosine_intensity
                  _7b_v2).transform`` + embedding SVC, exact k-NN (k=25 =
                  the reference's n_neighbors) under a numpy transcription of
                  that same gated metric (train_reference.py:993-1072).

Known deviations from the literal reference, all documented in place:
UMAP's 2-D embedding step is replaced by metric-space kNN (the structure
UMAP.transform itself approximates), and NL-means/KMeans parity is
statistical rather than bitwise (floating-point iteration order).

This package is TEST-ONLY scaffolding: nothing in hiprfish_tpu imports it.
"""
