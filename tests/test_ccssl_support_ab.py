"""Live-reference A/B for the CCSSL baseline support surface
(dsf_tpu/tools/ccssl_support.py vs the ACTUAL CCSSL/imutils.py,
CCSSL/transforms.py, CCSSL/misc.py)."""

import numpy as np
import pytest
import torch

from reference_import import load_reference_module
from dsf_tpu.tools import ccssl_support as cs


@pytest.fixture(scope="module")
def ref():
    # CCSSL/imutils.py:168 calls .cuda() in a module-level default arg
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        imutils = load_reference_module("CCSSL/imutils.py", "ref_cs_imutils")
        transforms = load_reference_module("CCSSL/transforms.py",
                                           "ref_cs_transforms")
        misc = load_reference_module("CCSSL/misc.py", "ref_cs_misc")
    finally:
        torch.Tensor.cuda = orig
    return imutils, transforms, misc


def test_gaussian_mask(ref):
    imutils, _, _ = ref
    for shape, sigma in (((7, 7), 1), ((5, 9), 2.5), ((3, 3), 0.5)):
        ours = cs.gaussian(shape, sigma)
        theirs = imutils.gaussian(shape, sigma).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-7)


@pytest.mark.parametrize("kind", ["Gaussian", "Cauchy"])
def test_draw_labelmap(ref, kind):
    imutils, _, _ = ref
    rng = np.random.RandomState(3)
    for pt in ([10.3, 20.7], [0.2, 0.4], [62.9, 63.5], [-2.0, 5.0],
               [61.0, -1.5], [200.0, 10.0], [-100.0, -100.0]):
        base = rng.rand(64, 64).astype(np.float64)
        ours, v_ours = cs.draw_labelmap(base.copy(), pt, sigma=2, type=kind)
        theirs, v_ref = imutils.draw_labelmap(
            torch.from_numpy(base.copy()), list(pt), sigma=2, type=kind)
        assert v_ours == v_ref
        np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-12)


def test_gaussian_label_map_composes_draw(ref):
    imutils, _, _ = ref
    pts = np.array([[10.0, 12.0], [40.5, 3.2], [-9.0, -9.0]])
    ours = cs.gaussian_label_map(pts, 48, sigma=1.0)
    for j, pt in enumerate(pts):
        theirs, _ = imutils.draw_labelmap(
            torch.zeros(48, 48, dtype=torch.float64), list(pt), sigma=1)
        np.testing.assert_allclose(ours[j], theirs.numpy(), atol=1e-6)


def test_color_heatmap(ref):
    imutils, _, _ = ref
    x = np.random.RandomState(0).rand(16, 16).astype(np.float32)
    np.testing.assert_array_equal(cs.color_heatmap(x),
                                  imutils.color_heatmap(x))


def test_get_transform_and_transform(ref):
    _, tr, _ = ref
    for center, scale, res, rot in (
            ([120.0, 90.0], 1.3, (64, 64), 0),
            ([10.0, 200.0], 0.7, (128, 128), 30),
            ([64.0, 64.0], 2.0, (96, 96), -115)):
        np.testing.assert_allclose(
            cs.get_transform(center, scale, res, rot=rot),
            tr.get_transform(center, scale, res, rot=rot), atol=1e-12)
        for pt in ([5.0, 9.0], [63.0, 1.0], [0.0, 0.0]):
            for inv in (0, 1):
                np.testing.assert_array_equal(
                    cs.transform(pt, center, scale, res, invert=inv, rot=rot),
                    tr.transform(pt, center, scale, res, invert=inv, rot=rot))


def test_transform_preds(ref):
    _, tr, _ = ref
    coords = np.random.RandomState(1).uniform(1, 63, (21, 2))
    ours = cs.transform_preds(coords.copy(), [100.0, 80.0], 1.1, (64, 64))
    theirs = tr.transform_preds(torch.from_numpy(coords.copy()),
                                [100.0, 80.0], 1.1, (64, 64)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


@pytest.mark.parametrize("rot", [0, 25])
def test_crop(ref, rot):
    _, tr, _ = ref
    rng = np.random.RandomState(7)
    img = rng.rand(1, 240, 320).astype(np.float64)  # CHW, max<=1
    center, scale, res = [160.0, 120.0], 1.0, (64, 64)
    ours = cs.crop(img.copy(), center, scale, res, rot=rot)
    theirs = tr.crop(torch.from_numpy(img.copy()), center, scale, res,
                     rot=rot).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_fliplr(ref):
    _, tr, _ = ref
    x3 = np.random.RandomState(2).rand(2, 5, 7)
    np.testing.assert_array_equal(cs.fliplr(x3.copy()), tr.fliplr(x3.copy()))
    x4 = np.random.RandomState(3).rand(3, 2, 5, 7)
    np.testing.assert_array_equal(cs.fliplr(x4.copy()), tr.fliplr(x4.copy()))


def test_color_normalize(ref):
    _, tr, _ = ref
    x = np.random.RandomState(4).rand(1, 8, 8).astype(np.float32)
    ours = cs.color_normalize(x, [0.3, 0.4, 0.5], [9.0, 9.0, 9.0])
    theirs = tr.color_normalize(torch.from_numpy(x.copy()),
                                [0.3, 0.4, 0.5], [9.0, 9.0, 9.0]).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_adjust_learning_rate(ref):
    _, _, misc = ref

    class _Opt:
        param_groups = [{"lr": 0.1}]

    lr_ref, lr_ours = 0.1, 0.1
    for epoch in range(12):
        lr_ref = misc.adjust_learning_rate(_Opt(), epoch, lr_ref,
                                           schedule=[4, 8], gamma=0.3)
        lr_ours = cs.adjust_learning_rate(lr_ours, epoch,
                                          schedule=[4, 8], gamma=0.3)
        assert lr_ours == pytest.approx(lr_ref)


def test_save_checkpoint_fileset(tmp_path):
    state = {"epoch": 4, "w": np.arange(3.0)}
    preds = np.ones((2, 21, 3))
    cs.save_checkpoint(state, preds, is_best=True,
                       checkpoint=str(tmp_path), snapshot=2)
    names = {p.name for p in tmp_path.iterdir()}
    assert {"checkpoint.npz", "preds.mat", "checkpoint_4.npz",
            "model_best.npz", "preds_best.mat"} <= names
    cs.save_pred(preds, checkpoint=str(tmp_path))
    assert (tmp_path / "preds_valid.mat").exists()


def test_contact_sheet_shapes():
    # scipy.misc.imresize is gone upstream, so the reference's display
    # tail cannot execute; assert our port's contract instead.
    inputs = np.random.RandomState(0).rand(2, 3, 64, 64) - 0.5
    heat = np.random.RandomState(1).rand(2, 6, 16, 16)
    sheet = cs.batch_with_heatmap(inputs, heat, num_rows=2)
    assert sheet.dtype == np.uint8
    assert sheet.shape == (128, 32 * (3 + 2), 3)
