"""Guard the AOT-warmup contract segment3d.warmup_pipeline relies on.

warmup_pipeline precompiles the tile/remap/measure programs with
``jit(f).lower(ShapeDtypeStruct...).compile()`` and assumes the later
*direct* call ``f(x)`` reuses that executable instead of recompiling
(verified by experiment; this test pins the behavior so a JAX upgrade
that silently breaks the sharing is caught by CI, not by a 30 s compile
reappearing on the 3D critical path)."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hiprfish_tpu.pipeline import segment3d


class _CompileLog(logging.Handler):
    def __init__(self):
        super().__init__()
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())


def test_aot_lower_compile_is_reused_by_direct_call():
    @jax.jit
    def fn(x, s):
        return jnp.tanh(x @ x) * s

    spec = jax.ShapeDtypeStruct((32, 32), jnp.float32)
    fn.lower(spec, jax.ShapeDtypeStruct((), jnp.float32)).compile()

    handler = _CompileLog()
    logger = logging.getLogger("jax._src.dispatch")
    old_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)
    try:
        jax.config.update("jax_log_compiles", True)
        out = fn(jnp.ones((32, 32), jnp.float32), jnp.float32(2.0))
        out.block_until_ready()
    finally:
        jax.config.update("jax_log_compiles", False)
        logger.removeHandler(handler)
        logger.setLevel(old_level)

    compiled = [m for m in handler.messages
                if "XLA compilation of jit(fn)" in m]
    assert not compiled, compiled


def test_stitch_aot_spec_matches_real_call():
    """bench3d AOT-lowers _stitch_device from specs computed the same way
    it later cuts the tiles; if the specs drift from the real call the
    stitch compile lands back on the timed stage. Assert the direct call
    after AOT emits no fresh XLA compile for the stitch program."""
    shape, tile_grid, overlap, pad = (96, 80, 12), (2, 2), 8, 4
    gy, gx = tile_grid
    ty = (shape[0] + (gy - 1) * overlap) // gy
    tx = (shape[1] + (gx - 1) * overlap) // gx
    t_spec = jax.ShapeDtypeStruct((ty, tx, shape[2]), jnp.float32)
    segment3d._stitch_device.lower(
        (t_spec,) * (gy * gx), (t_spec,) * (gy * gx), tile_grid, overlap,
        shape, pad, overlap).compile()

    rng = np.random.RandomState(0)
    vol = rng.rand(*shape).astype(np.float32)
    step_y, step_x = ty - overlap, tx - overlap
    tiles = [vol[i * step_y:i * step_y + ty, j * step_x:j * step_x + tx]
             for i in range(gy) for j in range(gx)]

    handler = _CompileLog()
    logger = logging.getLogger("jax._src.dispatch")
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)
    try:
        jax.config.update("jax_log_compiles", True)
        out = segment3d.stitch_tiles_device(tiles, tile_grid, overlap,
                                            shape, pad=pad)
        out.block_until_ready()
    finally:
        jax.config.update("jax_log_compiles", False)
        logger.removeHandler(handler)

    compiled = [m for m in handler.messages
                if "XLA compilation of jit(_stitch_device)" in m]
    assert not compiled, compiled
    # stitching identical-overlap cuts reproduces the scene interior
    inner = np.asarray(out)[pad:pad + shape[0], pad:pad + shape[1],
                            pad:pad + shape[2]]
    np.testing.assert_allclose(inner, vol, rtol=1e-5, atol=1e-5)


def test_warmup_pipeline_matches_direct_segmentation():
    """warmup_pipeline's AOT specs must exactly match the real call
    signatures of the tile/seeds/remap programs (a mismatch — e.g. a
    dtype drift between the warmed spec and what
    lp_cv_enhance_3d_chunked actually returns — silently recompiles on
    the critical path), and the warmed sweep must produce the same
    labels as an unwarmed one."""
    from hiprfish_tpu.config import SegmentationConfig
    from hiprfish_tpu.utils import synthetic3d as s3

    spec = s3.VolumeSpec(shape=(120, 64, 24), spacing=(30, 32, 24),
                         semi_axes_lo=(8.0, 6.0, 6.0),
                         semi_axes_hi=(10.0, 7.0, 8.0), seed=5)
    vol = s3.build_sum_volume(spec, 127, np.ones(127, np.float32), seed=2,
                              z_chunk=12)
    cfg = SegmentationConfig()
    kw = dict(max_cells=128, tile_x=40, margin=20, tile_cap=64, chunk_xy=32)

    join = segment3d.warmup_pipeline((120, 64, 24), cfg, max_cells=128,
                                     tile_x=40, margin=20, tile_cap=64,
                                     z_chunk=4, n_channels=63)
    join()

    handler = _CompileLog()
    logger = logging.getLogger("jax._src.dispatch")
    old_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)
    try:
        seg_w, n_w, _ = segment3d.segment_3d_tiled(vol, cfg, **kw)
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)
    fresh = [m for m in handler.messages
             if "XLA compilation of jit(" in m
             and any(p in m for p in ("_segment_tile_at", "_global_seeds",
                                      "_remap_tile"))]
    assert not fresh, f"warmed programs recompiled: {fresh}"

    # the jit caches are warm either way now; this second sweep checks
    # determinism of the warmed path
    seg_d, n_d, _ = segment3d.segment_3d_tiled(vol, cfg, **kw)
    assert int(n_w) == int(n_d) == spec.n_cells
    np.testing.assert_array_equal(np.asarray(seg_w), np.asarray(seg_d))
