"""Multi-device tests on the virtual 8-CPU mesh: spatial shard_map halo
exchange (bitwise parity vs single device), FOV-batch data parallelism, and
the psum data-parallel training step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hiprfish_tpu.parallel import fov_batch, mesh as meshlib, spatial


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return meshlib.make_mesh(8, fov=4, tile=2)


def test_spatial_lp_cv_sharded_matches_single_device(mesh8, rng):
    from hiprfish_tpu.ops.line_profile import lp_cv_enhance_2d

    img = jnp.asarray(rng.rand(128, 96).astype(np.float32))
    got = spatial.lp_cv_enhance_2d_sharded(img, mesh8, "tile")
    want = lp_cv_enhance_2d(img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_batched_fov_step_dp(mesh8):
    from hiprfish_tpu.config import SegmentationConfig
    import __graft_entry__ as g

    stack, clf_arrays, clf_static = g._tiny_classifier_and_fov(shape=(64, 64))
    batched = tuple(np.broadcast_to(s, (4,) + s.shape).copy() for s in stack)
    cfg = SegmentationConfig(watershed_max_iters=64, ccl_max_iters=64,
                             kmeans_iters=10)
    run = fov_batch.batched_fov_step(mesh8, cfg, 32, clf_static, denoise=False)
    out = run(batched, clf_arrays)
    assert out.segmentation.shape == (4, 64, 64)
    n = np.asarray(out.n_cells)
    assert (n == n[0]).all() and n[0] >= 3  # identical FOVs -> identical cells


def test_dp_training_psum(mesh8, rng):
    from hiprfish_tpu.models.classifier import _init_mlp, _mlp_logit

    x = rng.rand(512, 23).astype(np.float32)
    y = (x.mean(1) > 0.5).astype(np.float32)
    params = _init_mlp(jax.random.PRNGKey(0), 23, 32)
    trained = fov_batch.train_check_heads_dp(mesh8, x, y, params, steps=200,
                                             lr=3e-3)
    acc = np.mean(
        (np.asarray(_mlp_logit(trained, jnp.asarray(x))) > 0) == (y > 0.5))
    assert acc > 0.9
