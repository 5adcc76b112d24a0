"""Legacy UMAP-stack interop: loading reference-style umap_transform.pkl
artifacts without umap-learn, and the JAX re-implementation of
UMAP.transform feeding the embedded SVC (image_classification.py:44-56)."""

import pickle
import pandas as pd
import sys
import types

import numpy as np
import pytest

from hiprfish_tpu.models import umap_infer


def _fake_umap_pickle(tmp_path, raw, emb, a=1.577, b=0.8951,
                      n_neighbors=25, name="umap_transform.pkl"):
    """Emit a pickle whose global references match a joblib-dumped fitted
    umap.UMAP (module umap.umap_, class UMAP) by faking the module during
    dump, then removing it — loading it here then requires the permissive
    unpickler, exactly like a real artifact from the reference's
    environment."""
    mod = types.ModuleType("umap")
    sub = types.ModuleType("umap.umap_")

    class UMAP:
        pass

    UMAP.__module__ = "umap.umap_"
    UMAP.__qualname__ = "UMAP"
    sub.UMAP = UMAP
    mod.umap_ = sub
    obj = UMAP()
    obj._raw_data = raw
    obj.embedding_ = emb
    obj._a = a
    obj._b = b
    obj.n_neighbors = n_neighbors
    obj.metric = "euclidean"
    sys.modules["umap"] = mod
    sys.modules["umap.umap_"] = sub
    try:
        path = tmp_path / name
        with open(path, "wb") as f:
            pickle.dump(obj, f)
    finally:
        del sys.modules["umap"]
        del sys.modules["umap.umap_"]
    return str(path)


def _clustered_data(rng, n_classes=8, per=40, dim=20, noise=0.05):
    centers = rng.rand(n_classes, dim).astype(np.float32) + 0.2
    X = np.repeat(centers, per, axis=0) \
        + rng.randn(n_classes * per, dim).astype(np.float32) * noise
    y = np.repeat(np.arange(n_classes), per)
    # a well-separated synthetic "embedding": clusters on a circle
    ang = 2 * np.pi * y / n_classes
    emb = np.stack([10 * np.cos(ang), 10 * np.sin(ang)], 1).astype(np.float32)
    emb += rng.randn(*emb.shape).astype(np.float32) * 0.3
    return np.clip(X, 0, None), y, emb, centers


def test_permissive_load_extracts_arrays(tmp_path, rng):
    raw = rng.rand(50, 10).astype(np.float32)
    emb = rng.rand(50, 2).astype(np.float32)
    path = _fake_umap_pickle(tmp_path, raw, emb, a=1.25, b=0.79,
                             n_neighbors=7)
    assert "umap" not in sys.modules  # the point: umap-learn is NOT here
    model = umap_infer.load_umap_pickle(path)
    np.testing.assert_array_equal(model.raw_data, raw)
    np.testing.assert_array_equal(model.embedding, emb)
    assert model.a == pytest.approx(1.25)
    assert model.b == pytest.approx(0.79)
    assert model.n_neighbors == 7
    assert model.metric == "euclidean"


def test_permissive_load_rejects_non_umap(tmp_path):
    path = tmp_path / "not_umap.pkl"
    with open(path, "wb") as f:
        pickle.dump({"just": "a dict"}, f)
    with pytest.raises(ValueError):
        umap_infer.load_umap_pickle(str(path))


def test_transform_training_points_reembed_onto_themselves(rng):
    X, y, emb, _ = _clustered_data(rng)
    model = umap_infer.UmapModel(X, emb, 1.577, 0.8951, 15, "euclidean")
    out = np.asarray(umap_infer.umap_transform(model, X[::5], n_epochs=20))
    # each training point must land inside its own cluster: nearest cluster
    # centroid in embedding space is its own
    cents = np.stack([emb[y == c].mean(0) for c in range(y.max() + 1)])
    d = np.linalg.norm(out[:, None, :] - cents[None], axis=2)
    assert (d.argmin(1) == y[::5]).mean() == 1.0


def test_transform_held_out_points_join_their_cluster(rng):
    X, y, emb, centers = _clustered_data(rng)
    model = umap_infer.UmapModel(X, emb, 1.577, 0.8951, 15, "euclidean")
    # new noisy draws from each class
    qy = np.repeat(np.arange(centers.shape[0]), 6)
    Q = centers[qy] + rng.randn(len(qy), X.shape[1]).astype(np.float32) * 0.05
    out = np.asarray(umap_infer.umap_transform(model, np.clip(Q, 0, None),
                                               n_epochs=30))
    cents = np.stack([emb[y == c].mean(0) for c in range(y.max() + 1)])
    d = np.linalg.norm(out[:, None, :] - cents[None], axis=2)
    assert (d.argmin(1) == qy).mean() >= 0.99


def test_legacy_cli_classify_route(tmp_path, rng, monkeypatch):
    """cli/classify.py with -rf pointing at a *_umap_transform.pkl must run
    the reference's 3-pickle route and write the full artifact set."""
    from sklearn import svm
    import joblib

    from hiprfish_tpu.cli import classify as cli_classify

    n_classes, n_cells = 4, 24
    # 132-col reference feature layout: 95 ch + 31 violet-diff + 6 checks
    centers = np.clip(rng.rand(n_classes, 95).astype(np.float32), 0.05, None)
    y = np.repeat(np.arange(n_classes), 30)
    raw_spec = centers[y] + rng.randn(len(y), 95).astype(np.float32) * 0.02
    raw_spec = np.clip(raw_spec, 0, None)
    raw_spec /= raw_spec.max(axis=1, keepdims=True)
    feats = np.concatenate([raw_spec, np.zeros((len(y), 37), np.float32)], 1)
    feats[:, 95:126] = np.diff(feats[:, 0:32], axis=1)
    ref_blocks = [(0, 32), (32, 55), (55, 75), (75, 89), (89, 95), (95, 126)]
    check_svcs = []
    for i, (lo, hi) in enumerate(ref_blocks):
        bits = (y >> (i % 2)) % 2
        feats[:, 126 + i] = bits
        check_svcs.append(svm.SVC(C=10, gamma=0.5).fit(feats[:, lo:hi], bits))
    ang = 2 * np.pi * y / n_classes
    emb = np.stack([8 * np.cos(ang), 8 * np.sin(ang)], 1).astype(np.float32)
    emb += rng.randn(*emb.shape).astype(np.float32) * 0.2
    codebook = [format(c + 1, "010b") for c in range(n_classes)]
    svc_emb = svm.SVC(C=10, gamma=0.5).fit(
        emb, np.array([codebook[c] for c in y]))

    tr = _fake_umap_pickle(tmp_path, feats, emb,
                           name="ref_umap_transform.pkl")
    joblib.dump(svc_emb, tmp_path / "ref_umap_transformed_svc.pkl")
    joblib.dump(check_svcs, tmp_path / "ref_umap_transformed_check_svc.pkl")

    qy = rng.randint(0, n_classes, n_cells)
    q = np.clip(centers[qy] + rng.randn(n_cells, 95).astype(np.float32)
                * 0.02, 0, None)
    monkeypatch.chdir(tmp_path)
    np.savetxt("s_enc_1_avgint.csv", q, delimiter=",")
    seg = np.zeros((40, 40), np.int32)
    seg.reshape(-1)[: n_cells] = np.arange(1, n_cells + 1)
    np.save("s_enc_1_seg.npy", seg)

    cli_classify.main(["s_enc_1_avgint.csv", "-rf", tr])
    got = np.loadtxt("s_enc_1_cell_ids.txt", dtype=str)
    assert (got == np.array([codebook[c] for c in qy])).mean() >= 0.95
    import os
    assert os.path.exists("s_enc_1_avgint_ids.csv")


def test_full_legacy_stack_end_to_end(tmp_path, rng):
    """The reference artifact trio (umap_transform + embedded SVC + check
    SVCs) loaded by convention and scored on device recovers planted
    barcodes (image_classification.py:44-56)."""
    from sklearn import svm
    import joblib

    n_classes, dim_spec, n_checks = 6, 12, 2
    X, y, emb, centers = _clustered_data(rng, n_classes=n_classes,
                                         dim=dim_spec + n_checks)
    # the reference trains UMAP on [spectra | check-bit] columns where the
    # check columns hold the check SVCs' own 0/1 outputs — mirror that
    for i in range(n_checks):
        X[:, dim_spec + i] = (y % 2 == i)
        centers[:, dim_spec + i] = (np.arange(n_classes) % 2 == i)
    codebook = [format(c + 1, "07b") for c in range(n_classes)]
    labels = np.array([codebook[c] for c in y])
    # check-SVC feature layout: two blocks of 6 spectral cols, 2 check cols
    blocks = [(0, 6), (6, 12)]
    check_svcs = [svm.SVC(C=10, gamma=0.5).fit(X[:, lo:hi], (y % 2 == i))
                  for i, (lo, hi) in enumerate(blocks)]
    svc_emb = svm.SVC(C=10, gamma=0.5).fit(emb, labels)

    tr = _fake_umap_pickle(tmp_path, X, emb, name="foo_umap_transform.pkl")
    joblib.dump(svc_emb, tmp_path / "foo_umap_transformed_svc.pkl")
    joblib.dump(check_svcs, tmp_path / "foo_umap_transformed_check_svc.pkl")

    stack = umap_infer.load_legacy_umap_stack(tr, blocks=blocks)
    qy = np.repeat(np.arange(n_classes), 5)
    Q = centers[qy] + rng.randn(len(qy), X.shape[1]).astype(np.float32) * 0.04
    pred = stack.predict(np.clip(Q, 0, None), n_epochs=30)
    agree = (np.asarray(pred) == np.array([codebook[c] for c in qy])).mean()
    assert agree >= 0.99


def test_jax_rbf_svc_predict_proba_matches_sklearn(rng):
    """Platt + Wu-Lin-Weng coupling must reproduce sklearn's
    predict_proba (the biofilm path consumes it,
    biofilm_analysis.py:1227)."""
    from sklearn import svm

    from hiprfish_tpu.models.artifacts import JaxRbfSvc

    x = rng.rand(400, 10)
    y = (x[:, 0] * 4).astype(int)
    clf = svm.SVC(C=10, gamma=0.5, probability=True,
                  random_state=0).fit(x, y)
    ours = JaxRbfSvc.from_sklearn(clf)
    xt = rng.rand(60, 10)
    ref = clf.predict_proba(xt)
    got = ours.predict_proba(xt)
    assert np.abs(got - ref).max() < 5e-3
    assert (got.argmax(1) == ref.argmax(1)).all()


def test_legacy_7b_cli_route(tmp_path, rng, monkeypatch):
    """cli/classify_spectra.py with -r *_umap_transform_biofilm_7b.pkl runs
    the reference's 4-pickle stack (incl. StandardScaler feeding the check
    SVCs) and writes the cell_information schema."""
    from sklearn import svm
    from sklearn.preprocessing import StandardScaler
    import joblib

    from hiprfish_tpu.cli import classify_spectra as cli_cs

    n_classes, n_cells = 4, 20
    centers = np.clip(rng.rand(n_classes, 63).astype(np.float32), 0.05, None)
    y = np.repeat(np.arange(n_classes), 30)
    raw = np.clip(centers[y] + rng.randn(len(y), 63).astype(np.float32)
                  * 0.02, 0, None)
    raw /= raw.max(axis=1, keepdims=True)
    scaler = StandardScaler().fit(raw)
    feats = np.concatenate([raw, np.zeros((len(y), 4), np.float32)], 1)
    blocks = [(0, 23), (23, 43), (43, 57), (57, 63)]
    scaled = scaler.transform(raw)
    checks = []
    for i, (lo, hi) in enumerate(blocks):
        bits = (y >> (i % 2)) % 2
        feats[:, 63 + i] = bits
        checks.append(svm.SVC(C=10, gamma=0.5).fit(scaled[:, lo:hi], bits))
    ang = 2 * np.pi * y / n_classes
    emb = np.stack([8 * np.cos(ang), 8 * np.sin(ang)], 1).astype(np.float32)
    emb += rng.randn(*emb.shape).astype(np.float32) * 0.2
    codebook = [format(c + 1, "07b") for c in range(n_classes)]
    svc_emb = svm.SVC(C=10, gamma=0.5).fit(
        emb, np.array([codebook[c] for c in y]))

    tr = _fake_umap_pickle(tmp_path, feats, emb,
                           name="ref_umap_transform_biofilm_7b.pkl")
    joblib.dump(scaler,
                tmp_path / "ref_umap_transformed_biofilm_7b_scaler.pkl")
    joblib.dump(svc_emb, tmp_path / "ref_umap_transformed_biofilm_7b_svc.pkl")
    joblib.dump(checks,
                tmp_path / "ref_umap_transformed_biofilm_7b_check_svc.pkl")

    qy = rng.randint(0, n_classes, n_cells)
    q = np.clip(centers[qy] + rng.randn(n_cells, 63).astype(np.float32)
                * 0.02, 0, None)
    monkeypatch.chdir(tmp_path)
    pd.DataFrame(q).to_csv("s7_avgint_norm.csv", index=False)
    seg = np.zeros((40, 40), np.int32)
    seg.reshape(-1)[: n_cells] = np.arange(1, n_cells + 1)
    np.save("s7_seg.npy", seg)

    cli_cs.main(["-i", "s7_avgint_norm.csv", "-r", str(tr)])
    # the reference reads this file with dtype={67: str} to keep leading
    # zeros (classify_spectra.py) — mirror that
    info = pd.read_csv("s7_cell_information.csv", header=None,
                       dtype={67: str})
    assert info.shape[0] == n_cells
    got = info.iloc[:, 67].values
    want = np.array([codebook[c] for c in qy])
    assert (got == want).mean() >= 0.95
