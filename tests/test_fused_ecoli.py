"""Parity of the fused single-program ecoli engine vs the host-orchestrated
reference-semantics engine."""

import numpy as np
import pytest
import jax.numpy as jnp

from hiprfish_tpu.config import TEN_BIT, SegmentationConfig
from hiprfish_tpu.pipeline import fused_ecoli, segment2d
from hiprfish_tpu.utils import synthetic

CODES = [5, 37, 515, 1023, 96, 640, 17, 260, 770]


@pytest.mark.slow
def test_fused_ecoli_matches_host_engine():
    fov = synthetic.make_fov(
        TEN_BIT, CODES, shape=(192, 192), seed=1,
        laser_shifts=[(0, 0), (1, -1), (0, 1), (-1, 0), (1, 1)],
        cell_axes=(9.0, 14.0))
    stack = tuple(jnp.asarray(a) for a in fov["stack"])
    cfg = SegmentationConfig()
    seg_f, n_f, reg_f, avg_f = fused_ecoli.segment_ecoli_device(stack, cfg,
                                                                256)
    res_h = segment2d.segment_ecoli(fov["stack"], cfg, 256)
    assert int(n_f) == int(res_h.n_cells) == len(CODES)
    # Same cells: every fused cell overlaps exactly one host cell with IoU>0.8
    a = np.asarray(seg_f)
    b = np.asarray(res_h.segmentation)
    for lab_id in range(1, len(CODES) + 1):
        mask_a = a == lab_id
        ids, cnt = np.unique(b[mask_a], return_counts=True)
        best = ids[np.argmax(cnt)]
        mask_b = b == best
        iou = (mask_a & mask_b).sum() / (mask_a | mask_b).sum()
        assert best > 0 and iou > 0.8, (lab_id, best, iou)
    np.testing.assert_allclose(np.asarray(reg_f),
                               np.asarray(res_h.registered), rtol=1e-5)
