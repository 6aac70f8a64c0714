"""Per-dataset skeleton/color/hierarchy tables vs the reference's live
vis_tool module, plus drawing smoke tests."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from dsf_tpu.utils import vis, vis_debug  # noqa: E402
from tests.reference_import import load_reference_module  # noqa: E402


@pytest.fixture(scope="module")
def ref_vis():
    return load_reference_module("util/vis_tool.py", "ref_vis_tool")


DATASETS = ["nyu", "icvl", "msra", "shrec", "hands"]


@pytest.mark.parametrize("dataset", DATASETS + ["mano"])
def test_sketch_edges_match_reference(ref_vis, dataset):
    ref = [tuple(e) for e in ref_vis.get_sketch_setting(dataset)]
    ours = [tuple(e) for e in vis.get_sketch_setting(
        "MANO" if dataset == "mano" else dataset)]
    assert ours == ref


@pytest.mark.parametrize("dataset", DATASETS + ["mano"])
def test_joint_color_values_match_reference(ref_vis, dataset):
    ref = [tuple(c.value) for c in ref_vis.get_joint_color(dataset)]
    ours = vis.get_joint_color("MANO" if dataset == "mano" else dataset)
    assert [tuple(c) for c in ours] == ref


@pytest.mark.parametrize("dataset", DATASETS + ["mano"])
def test_sketch_color_values_match_reference(ref_vis, dataset):
    ref = [tuple(c.value) for c in ref_vis.get_sketch_color(dataset)]
    ours = vis.get_sketch_color("MANO" if dataset == "mano" else dataset)
    assert [tuple(c) for c in ours] == ref


def test_segment_colormaps_match_reference(ref_vis):
    assert np.array_equal(vis.get_segment_joint_color(),
                          ref_vis.get_segmentJointColor())
    assert np.array_equal(vis.get_segment_finger_color(),
                          ref_vis.get_segmentFingerColor())
    assert np.array_equal(vis.get_nyu_segment_joint_color(),
                          ref_vis.get_nyu_segmentJointColor())
    assert np.array_equal(vis.get_segment_bk_color(),
                          ref_vis.get_segmentBKColor())


def _edges(seq):
    return [tuple(e) for e in seq]


def test_hierarchy_tables_match_reference(ref_vis):
    for ds in ("hands", "nyu"):
        c_ref, a_ref = ref_vis.get_hierarchical_setting(ds)
        c, a = vis_debug.get_hierarchical_setting(ds)
        assert _edges(c) == _edges(c_ref) and _edges(a) == _edges(a_ref)
    c_ref, a_ref, n_ref = ref_vis.get_bone_hierarchical_setting("hands")
    c, a, n = vis_debug.get_bone_hierarchical_setting("hands")
    assert _edges(c) == _edges(c_ref) and _edges(a) == _edges(a_ref)
    assert n == n_ref
    assert vis_debug.get_sketch_group("hands") == \
        ref_vis.get_sketch_group("hands")
    for ds in ("hands", "nyu"):
        assert vis_debug.get_joint_group(ds) == ref_vis.get_joint_group(ds)
        assert _edges(vis_debug.get_adj_setting(ds)) == \
            _edges(ref_vis.get_adj_setting(ds))
        assert np.array_equal(vis_debug.get_joint_size(ds),
                              ref_vis.get_joint_size(ds))


def test_dense_and_multiview_sketch_match_reference(ref_vis):
    for ds in ("hands", "nyu", "icvl", "msra"):
        assert _edges(vis_debug.get_dense_sketch_setting(ds)) == \
            _edges(ref_vis.get_dense_sketch_setting(ds))
    for ds in ("hands", "nyu"):
        assert _edges(vis_debug.get_multi_view_sketch_setting(ds)) == \
            _edges(ref_vis.get_multiView_sketch_setting(ds))


def test_hierarchy_mat_mapping_sketch_match_reference(ref_vis):
    for ds in ("mano", "nyu"):
        assert np.array_equal(vis_debug.get_hierarchy_mat(ds),
                              np.asarray(ref_vis.get_hierarchy_mat(ds)))
        assert vis_debug.get_hierarchy_mapping(ds) == \
            ref_vis.get_hierarchy_mapping(ds)
        ours, refs = (vis_debug.get_hierarchy_sketch(ds),
                      ref_vis.get_hierarchy_sketch(ds))
        assert len(ours) == len(refs)
        for o, r in zip(ours, refs):
            assert _edges(o) == _edges(r)


def test_bone_tables_match_reference(ref_vis):
    for ds in ("hands", "nyu", "msra", "icvl"):
        for dense in (True, False):
            assert vis_debug.get_bone_num(ds, dense) == \
                ref_vis.get_bone_num(ds, dense)
            assert _edges(vis_debug.get_bone_edge(ds, dense)) == \
                _edges(ref_vis.get_bone_edge(ds, dense))
        assert _edges(vis_debug.get_bone_id_setting(ds)) == \
            _edges(ref_vis.get_bone_id_setting(ds))


def test_hand_model_tables_match_reference(ref_vis):
    assert _edges(vis_debug.get_hand_model_pill()) == \
        _edges(ref_vis.get_HandModel_pill("hands"))
    assert _edges(vis_debug.get_hand_model_wedge()) == \
        _edges(ref_vis.get_HandModel_wedge("hands"))
    assert np.array_equal(vis_debug.get_hand_model_size(),
                          ref_vis.get_HandModel_size("hands"))
    assert _edges(vis_debug.get_hand_model_bone()) == \
        _edges(ref_vis.get_HandModel_bone("hands"))
    mean, std = vis_debug.get_bone_len()
    mean_ref, std_ref = ref_vis.get_BoneLen("hands")
    assert mean == mean_ref and std == std_ref
    assert _edges(vis_debug.get_finger_group()) == \
        _edges(ref_vis.get_FingerGroup("hands"))
    assert _edges(vis_debug.get_palm_group()) == \
        _edges(ref_vis.get_PlamGroup("hands"))
    assert np.allclose(vis_debug.get_palm_angle_con(),
                       ref_vis.get_PlamAngleCon("hands"))


def test_nyu_adj_mat_matches_reference(ref_vis):
    assert np.array_equal(vis_debug.get_adj_mat("nyu"),
                          np.asarray(ref_vis.get_adj_mat("nyu"),
                                     np.float32))


# ---------------------------------------------------------------------------
# drawing smoke tests
# ---------------------------------------------------------------------------

def test_draw_pose_all_datasets():
    rng = np.random.RandomState(0)
    for ds, n in [("nyu", 14), ("icvl", 16), ("msra", 21), ("shrec", 22),
                  ("hands", 21), ("MANO", 21)]:
        img = np.zeros((64, 64), np.float32)
        juvd = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
        out = vis.draw_2d_pose(img, juvd, dataset=ds)
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8
        assert out.max() > 0


def test_draw_variants():
    rng = np.random.RandomState(1)
    pose = rng.uniform(10, 50, (21, 2))
    img = np.zeros((64, 64, 3), np.uint8)
    assert vis.draw_point("MANO", img.copy(), pose).max() > 0
    assert vis.draw_coll_pose("MANO", img.copy(), pose).max() > 0
    conf = rng.rand(21)
    assert vis.draw_conf("MANO", img.copy(), pose, conf).max() > 0
    visible = rng.randint(0, 2, 21)
    assert vis.draw_visible("MANO", img.copy(), pose, visible).max() > 0


def test_draw_pcl_and_rotate():
    rng = np.random.RandomState(2)
    pcl = rng.uniform(-0.9, 0.9, (2, 100, 3)).astype(np.float32)
    img = vis.draw_pcl(pcl, 32)
    assert img.shape == (2, 1, 32, 32)
    assert (img == -1).any() and (img == 1).any()
    # identity rotation keeps xyz
    rot = vis.rotate_pcl(pcl, np.zeros(3))
    assert np.allclose(rot[..., :3], pcl, atol=1e-6)
    # z-rotation by pi flips x and y
    rot = vis.rotate_pcl(pcl, np.array([0.0, 0.0, np.pi]))
    assert np.allclose(rot[..., :2], -pcl[..., :2], atol=1e-5)


def test_stack_and_grid(tmp_path):
    imgs = np.arange(3 * 2 * 8 * 8, dtype=np.float32).reshape(3, 2, 8, 8)
    rows = vis.stack_row_pic(imgs)
    cols = vis.stack_col_pic(imgs)
    assert rows.shape == (2, 8, 24) and cols.shape == (2, 24, 8)
    grid = vis.draw_muti_pic([imgs[i] for i in range(3)], index=0,
                             data_dir=str(tmp_path), name="g", save=True,
                             max_col=2)
    assert grid.shape[0] == 16   # 2 rows of 8 (last row padded)
    import os
    assert len(os.listdir(tmp_path)) == 2


def test_vis_segment(tmp_path):
    seg = np.random.RandomState(3).randint(0, 22, (2, 16, 16))
    imgs = vis.vis_segment(seg, "joint", data_dir=str(tmp_path))
    assert imgs.shape == (2, 16, 16, 3)
    import os
    assert len(os.listdir(tmp_path)) == 2
    for t in ("bk", "finger", "nyu"):
        assert vis.vis_segment(seg % 2, t).shape == (2, 16, 16, 3)
