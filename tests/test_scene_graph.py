"""Scene-graph pair maker: reference-DIRECT parity — gd3d's index-level
make_pair_indices must emit the exact pair sequence of the upstream
dust3r.image_pairs.make_pairs for every strategy and prefilter."""
import sys

import pytest

from gd3d.data.scene_graph import make_pair_indices


def _ref_make_pairs():
    for p in ("/root/reference/dust3r",):
        if p not in sys.path:
            sys.path.append(p)
    from dust3r.image_pairs import make_pairs
    return make_pairs


@pytest.mark.parametrize("scene_graph", [
    "complete", "swin-1", "swin-2", "swin-3", "swin-2-noncyclic",
    "logwin-2", "logwin-3", "logwin-2-noncyclic", "oneref-0", "oneref-3",
])
@pytest.mark.parametrize("n,symmetrize", [(5, True), (8, False), (2, True)])
def test_pair_indices_match_reference(scene_graph, n, symmetrize):
    if scene_graph == "oneref-3" and n <= 3:
        pytest.skip("refid out of range (IndexError upstream too)")
    make_pairs = _ref_make_pairs()
    imgs = [{"idx": i} for i in range(n)]
    ref = [(a["idx"], b["idx"]) for a, b in
           make_pairs(imgs, scene_graph=scene_graph, symmetrize=symmetrize)]
    got = make_pair_indices(n, scene_graph, symmetrize=symmetrize)
    assert got == ref


@pytest.mark.parametrize("prefilter", ["seq1", "seq3", "cyc1", "cyc2"])
def test_prefilter_matches_reference(prefilter):
    make_pairs = _ref_make_pairs()
    imgs = [{"idx": i} for i in range(7)]
    ref = [(a["idx"], b["idx"]) for a, b in
           make_pairs(imgs, scene_graph="complete", prefilter=prefilter)]
    got = make_pair_indices(7, "complete", prefilter=prefilter)
    assert got == ref


def test_unknown_strategy_raises():
    with pytest.raises(ValueError):
        make_pair_indices(4, "nope")
    with pytest.raises(ValueError):
        make_pair_indices(4, "complete", prefilter="bogus9")


def test_oneref_out_of_range_raises():
    with pytest.raises(ValueError, match="out of range"):
        make_pair_indices(5, "oneref-9")


def test_empty_graph_with_prefilter_returns_empty():
    assert make_pair_indices(1, "complete", prefilter="seq1") == []
