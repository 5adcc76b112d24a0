"""Legacy sklearn interop: reference-trained RBF SVC pickles re-scored as
JAX GEMMs must reproduce sklearn.predict exactly (the parity harness for
comparing against reference-trained artifacts, models/artifacts.py)."""

import numpy as np

from hiprfish_tpu.models.artifacts import JaxRbfSvc


def test_jax_rbf_svc_binary_matches_sklearn(rng):
    from sklearn import svm

    x = rng.rand(300, 23)
    y = (x[:, :5].mean(1) > 0.5).astype(int)
    clf = svm.SVC(C=10, gamma=0.5).fit(x, y)
    ours = JaxRbfSvc.from_sklearn(clf)
    xt = rng.rand(100, 23)
    np.testing.assert_array_equal(np.asarray(ours.predict(xt)),
                                  clf.predict(xt))


def test_jax_rbf_svc_multiclass_matches_sklearn(rng):
    from sklearn import svm

    x = rng.rand(400, 10)
    y = (x[:, 0] * 3).astype(int)  # 3 classes
    clf = svm.SVC(C=10, gamma=0.5).fit(x, y)
    ours = JaxRbfSvc.from_sklearn(clf)
    xt = rng.rand(150, 10)
    agree = np.mean(np.asarray(ours.predict(xt)) == clf.predict(xt))
    assert agree == 1.0


def test_jax_rbf_svc_string_classes(rng):
    from sklearn import svm

    x = rng.rand(200, 8)
    y = np.where(x[:, 0] > 0.5, "0000000101", "0001000000")
    clf = svm.SVC(C=10, gamma=0.5).fit(x, y)
    ours = JaxRbfSvc.from_sklearn(clf)
    xt = rng.rand(50, 8)
    np.testing.assert_array_equal(np.asarray(ours.predict(xt)),
                                  clf.predict(xt))
