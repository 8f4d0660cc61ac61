"""Coarse-to-fine crop planning (gd3d/crops.py) vs the reference.

The parity test imports the reference's ACTUAL mast3r/utils/coarse_to_fine.py
(pure numpy) and asserts the planned crop-pair sequence is identical.
"""
import sys

import numpy as np
import pytest

from gd3d.crops import (
    greedy_cover,
    norm_windows,
    overlapping_grid,
    score_cells,
    select_crop_pairs,
)

REF = "/root/reference"


def _rand_corres(rng, n, H1, W1, H2, W2):
    """Clustered correspondences: an affine map + noise, clipped inside."""
    p1 = rng.rand(n, 2) * (W1 * 0.8, H1 * 0.8) + (W1 * 0.1, H1 * 0.1)
    A = np.array([[0.7, 0.05], [-0.04, 0.65]])
    p2 = p1 @ A.T + (W2 * 0.15, H2 * 0.2) + rng.randn(n, 2) * 3
    p2 = np.clip(p2, 0, (W2 - 1, H2 - 1))
    return p1.astype(np.float32), p2.astype(np.float32)


def test_overlapping_grid_covers_and_aligns():
    g = overlapping_grid(600, 900, 512, 0.5)
    w = g[:, 2] - g[:, 0]
    h = g[:, 3] - g[:, 1]
    assert (w % 16 == 0).all() and (h % 16 == 0).all()
    assert g[:, 0].min() == 0 and g[:, 1].min() == 0
    assert g[:, 2].max() == pytest.approx(900, abs=16)
    assert g[:, 3].max() == pytest.approx(600, abs=16)


def test_norm_windows_forced_resolution_exact_and_inside():
    rng = np.random.RandomState(0)
    cells = rng.rand(40, 2, 2)
    cells = np.concatenate(
        [cells.min(1) * 500, cells.min(1) * 500 + rng.rand(40, 2) * 400], 1)
    out = norm_windows(cells, 480, 640, forced_resolution=(384, 512))
    assert ((out[:, 2] - out[:, 0]) == 512).all()
    assert ((out[:, 3] - out[:, 1]) == 384).all()
    assert (out[:, 0] >= 0).all() and (out[:, 1] >= 0).all()
    assert (out[:, 2] <= 640).all() and (out[:, 3] <= 480).all()


def test_norm_windows_aspect_mode_matches_reference():
    sys.path.append(REF)
    from mast3r.utils.coarse_to_fine import _norm_windows as ref_norm

    rng = np.random.RandomState(1)
    lt = rng.rand(30, 2) * 300
    cells = np.c_[lt, lt + 50 + rng.rand(30, 2) * 450]
    np.testing.assert_array_equal(
        norm_windows(cells, 700, 900), ref_norm(cells.copy(), 700, 900))


def test_greedy_cover_prefers_high_coverage():
    w = np.array([[1.0, 1.0, 0.0, 0.0],
                  [0.0, 0.0, 1.0, 0.0],
                  [0.0, 0.0, 0.9, 0.9]])
    order = greedy_cover(w, target=0.9)
    assert order[0] == 2 or order[0] == 0
    covered = np.zeros(4)
    for i in order:
        covered = np.maximum(covered, w[i])
    assert covered.sum() >= 0.9 * w.max(axis=0).sum()


def test_score_cells_min_corres_filter():
    cells = np.array([[0, 0, 256, 256], [600, 600, 856, 856]], float)
    rng = np.random.RandomState(2)
    p1 = rng.rand(30, 2) * 200  # all in the first cell
    p2 = p1 * 0.9 + 10
    c1, c2, w = score_cells(cells, 900, 900, p1, p2, min_corres=10)
    assert len(c1) == 1 and len(c2) == 1
    assert w.shape == (1, 30) and (w > 0).all()


def test_select_crop_pairs_matches_reference_sequence():
    """Reference-direct: identical (cell1, cell2) sequence for the same
    correspondences (mast3r/utils/coarse_to_fine.py:184-215)."""
    sys.path.append(REF)
    from mast3r.utils.coarse_to_fine import select_pairs_of_crops

    rng = np.random.RandomState(3)
    H1, W1, H2, W2 = 800, 1200, 768, 1024
    p1, p2 = _rand_corres(rng, 300, H1, W1, H2, W2)
    img1 = np.zeros((H1, W1, 3), np.uint8)
    img2 = np.zeros((H2, W2, 3), np.uint8)

    ref_pairs = list(select_pairs_of_crops(
        img1, img2, p1, p2, maxdim=512, overlap=0.5,
        forced_resolution=(384, 512)))
    c1, c2 = select_crop_pairs(
        (H1, W1), (H2, W2), p1, p2, maxdim=512, overlap=0.5,
        forced_resolution=(384, 512))
    assert len(ref_pairs) > 0
    assert len(c1) == len(ref_pairs)
    for i, (rc1, rc2, _) in enumerate(ref_pairs):
        np.testing.assert_array_equal(c1[i], rc1)
        np.testing.assert_array_equal(c2[i], rc2)


def test_select_crop_pairs_empty_correspondences():
    c1, c2 = select_crop_pairs((480, 640), (480, 640),
                               np.zeros((0, 2)), np.zeros((0, 2)),
                               forced_resolution=(384, 512))
    assert len(c1) == 0 and len(c2) == 0


def test_select_crop_pairs_crops_contain_matches():
    """Every correspondence should be covered by at least one planned pair
    (both endpoints inside their respective windows) at target coverage."""
    rng = np.random.RandomState(4)
    H1, W1, H2, W2 = 800, 1200, 768, 1024
    p1, p2 = _rand_corres(rng, 200, H1, W1, H2, W2)
    c1, c2 = select_crop_pairs((H1, W1), (H2, W2), p1, p2,
                               forced_resolution=(384, 512))
    inside = np.zeros(len(p1), bool)
    for a, b in zip(c1, c2):
        in1 = ((a[0] <= p1[:, 0]) & (p1[:, 0] < a[2])
               & (a[1] <= p1[:, 1]) & (p1[:, 1] < a[3]))
        in2 = ((b[0] <= p2[:, 0]) & (p2[:, 0] < b[2])
               & (b[1] <= p2[:, 1]) & (p2[:, 1] < b[3]))
        inside |= in1 & in2
    assert inside.mean() > 0.75  # greedy targets 0.9 of the soft weights
