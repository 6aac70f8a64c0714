"""Per-dataset skeleton/color tables vs the reference's live vis_tool."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from dsf_tpu.utils import vis  # noqa: E402
from tests.reference_import import load_reference_module  # noqa: E402


@pytest.fixture(scope="module")
def ref_vis():
    return load_reference_module("util/vis_tool.py", "ref_vis_tool")


@pytest.mark.parametrize("dataset", ["nyu", "icvl", "msra", "shrec",
                                     "hands"])
def test_sketch_edges_match_reference(ref_vis, dataset):
    ref = [tuple(e) for e in ref_vis.get_sketch_setting(dataset)]
    ours = [tuple(e) for e in vis.get_sketch_setting(dataset)]
    assert ours == ref


@pytest.mark.parametrize("dataset", ["nyu", "icvl", "msra", "shrec",
                                     "hands"])
def test_joint_color_grouping_matches_reference(ref_vis, dataset):
    """Palette values may differ; what must match is the per-joint
    finger GROUPING: two joints share a color in ours iff they do in
    the reference."""
    ref = ref_vis.get_joint_color(dataset)
    ours = vis.get_joint_color(dataset)
    assert len(ours) == len(ref)
    for i in range(len(ref)):
        for j in range(len(ref)):
            assert (ours[i] == ours[j]) == (ref[i] == ref[j]), (dataset, i, j)


def test_draw_pose_all_datasets():
    rng = np.random.RandomState(0)
    for ds, n in [("nyu", 14), ("icvl", 16), ("msra", 21), ("shrec", 22),
                  ("hands", 21), ("MANO", 21)]:
        img = np.zeros((64, 64), np.float32)
        juvd = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
        out = vis.draw_2d_pose(img, juvd, dataset=ds)
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8
        assert out.max() > 0
