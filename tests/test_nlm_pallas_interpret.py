"""Interpret-mode CI coverage for the Pallas NLM kernel (TPU-only on
hardware): exact agreement with the XLA fast-mode NLM (ops/denoise.py,
itself oracle-tested against skimage semantics), and unroll-factor
invariance (the dx-loop unroll must be a pure scheduling knob)."""

import numpy as np
import jax.numpy as jnp

from hiprfish_tpu.ops import denoise
from hiprfish_tpu.ops import nlm_pallas


def test_nlm_pallas_interpret_matches_xla_path():
    rng = np.random.RandomState(0)
    img = rng.rand(96, 160).astype(np.float32)
    out = np.asarray(nlm_pallas.denoise_nl_means_pallas(
        jnp.asarray(img), 0.02, 7, 11, 128, True))
    ref = np.asarray(denoise.denoise_nl_means(jnp.asarray(img), 0.02, 7, 11))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)


def test_nlm_pallas_unroll_is_pure_scheduling():
    rng = np.random.RandomState(1)
    img = rng.rand(64, 128).astype(np.float32)
    base = np.asarray(nlm_pallas.denoise_nl_means_pallas(
        jnp.asarray(img), 0.02, 7, 11, 128, True, 1))
    for u in (2, 4):
        out = np.asarray(nlm_pallas.denoise_nl_means_pallas(
            jnp.asarray(img), 0.02, 7, 11, 128, True, u))
        np.testing.assert_allclose(out, base, rtol=0, atol=0)


def test_nlm_pallas_all_variants_match_xla_path():
    """Every kernel formulation (quad = r04, groups = shipped default,
    groups-chunk / groups-static = measured alternates) must agree with
    the XLA path; the dy-group batching and the chunked/static dx
    factorizations (roll(roll(x, m), t) == roll(x, m + t)) are pure
    scheduling."""
    rng = np.random.RandomState(3)
    img = rng.rand(96, 160).astype(np.float32)
    ref = np.asarray(denoise.denoise_nl_means(jnp.asarray(img), 0.02, 7, 11))
    for variant in ("quad", "groups", "groups-chunk", "groups-static"):
        out = np.asarray(nlm_pallas.denoise_nl_means_pallas(
            jnp.asarray(img), 0.02, 7, 11, 128, True, None, variant))
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6,
                                   err_msg=variant)


def test_nlm_pallas_quad_grouping_edge_paths():
    """The r04 kernel groups dy rows in quads with single-row leftovers;
    exercise pd < 4 (no quads at all) and pd = 6 (one quad + 2 leftover
    rows) against the XLA path — the pd=11 tests above only cover the
    2-quads + 3-leftovers shape."""
    rng = np.random.RandomState(2)
    img = rng.rand(64, 96).astype(np.float32)
    for pd in (3, 6):
        out = np.asarray(nlm_pallas.denoise_nl_means_pallas(
            jnp.asarray(img), 0.02, 7, pd, 64, True))
        ref = np.asarray(denoise.denoise_nl_means(
            jnp.asarray(img), 0.02, 7, pd))
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)
