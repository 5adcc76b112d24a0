"""Interpret-mode CI for the LP-CV Pallas kernels (2D tile kernel and the
fused 3D kernel): they must reproduce the XLA formulations that CPU runs
use (which are themselves oracle-tested against the reference .pyx
semantics in test_ops_line_profile / test_parity_reference)."""

import numpy as np
import jax.numpy as jnp

from hiprfish_tpu.ops import lp3d_pallas, lp_pallas
from hiprfish_tpu.ops import line_profile as lp


def test_lp2d_pallas_interpret_matches_fused_xla():
    rng = np.random.RandomState(0)
    img = rng.rand(96, 160).astype(np.float32)
    got = np.asarray(lp_pallas.lp_cv_enhance_2d_pallas(
        jnp.asarray(img), 11, 9, 128, True))
    ref = np.asarray(lp.lp_cv_enhance_2d(jnp.asarray(img), 11, 9))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_lp3d_fused_interpret_matches_xla_sweep():
    from hiprfish_tpu.pipeline import segment3d

    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.rand(24, 40, 16).astype(np.float32))
    ref = np.asarray(segment3d._lp_cv_3d_device(vol, 11, 9, 9, 16, True))
    got = np.asarray(lp3d_pallas.lp_cv_enhance_3d_fused(
        vol, 11, 9, 9, (8, 8, 128), True))
    np.testing.assert_allclose(got, ref, atol=2e-3)
