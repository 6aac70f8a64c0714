"""A/B parity against the ACTUAL reference implementation.

Runs the reference's pure-torch modules (with pytorch3d/torchvision
stubbed — see reference_import.py) and asserts dsf_tpu matches their
numerics on random inputs:

* MANO_SMPL.forward / get_mano_vertices  (render_model/mano_layer.py:573-693)
* GFM.joint2offset / offset2joint_softmax (util/generateFeature.py:14-59)
* SmoothL1Loss                            (metric/losses.py:6-30)
* Crop_Image_deep_pp / comToTransform /
  normalize_img / augmentCrop             (data/render_loader.py:627-810)
* MANO_OCR forward with converted weights (model/backbone.py:94-185)

Both sides consume the SAME synthetic MANO asset (the real pkl is
license-gated), so this validates the math, not the asset.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from dsf_tpu.data import crop as dcrop  # noqa: E402
from dsf_tpu.losses.basic import smooth_l1  # noqa: E402
from dsf_tpu.mano import model as mano  # noqa: E402
from dsf_tpu.mano import synthetic  # noqa: E402
from dsf_tpu.ops.offset_codec import joint2offset, offset2joint_softmax  # noqa: E402

from tests.reference_import import load_reference_module  # noqa: E402


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("mano_assets")
    pkl = synthetic.save_synthetic_mano_pkl(str(d / "MANO_RIGHT.pkl"))
    npz = synthetic.save_synthetic_mano(str(d / "mano.npz"))
    return pkl, npz


@pytest.fixture(scope="module")
def ref_mano(assets):
    m = load_reference_module("render_model/mano_layer.py", "ref_mano_layer")
    return m, m.MANO_SMPL(assets[0], "nyu")


@pytest.fixture(scope="module")
def our_mano(assets):
    return mano.load_model(assets[1])


# ---------------------------------------------------------------------------
# MANO LBS
# ---------------------------------------------------------------------------

def test_mano_forward_matches_reference(ref_mano, our_mano):
    _, ref = ref_mano
    rng = np.random.RandomState(3)
    B = 4
    beta = rng.randn(B, 10).astype(np.float32) * 2.0
    theta = rng.randn(B, 45).astype(np.float32) * 0.7
    rot = rng.uniform(-np.pi, np.pi, (B, 3)).astype(np.float32)

    with torch.no_grad():
        rv, rj, rRs = ref.forward(torch.tensor(beta), torch.tensor(theta),
                                  torch.tensor(rot), get_skin=True)
    ov, oj, oRs = mano.lbs(our_mano, jnp.asarray(beta), jnp.asarray(theta),
                           jnp.asarray(rot))
    np.testing.assert_allclose(np.asarray(ov), rv.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(oj), rj.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(oRs), rRs.numpy(), atol=1e-5)


def test_mano_forward_quaternion_rot(ref_mano, our_mano):
    _, ref = ref_mano
    rng = np.random.RandomState(4)
    B = 3
    beta = rng.randn(B, 10).astype(np.float32)
    theta = rng.randn(B, 45).astype(np.float32)
    quat = rng.randn(B, 4).astype(np.float32)

    with torch.no_grad():
        rv, rj, _ = ref.forward(torch.tensor(beta), torch.tensor(theta),
                                torch.tensor(quat), get_skin=True)
    ov, oj, _ = mano.lbs(our_mano, jnp.asarray(beta), jnp.asarray(theta),
                         jnp.asarray(quat))
    np.testing.assert_allclose(np.asarray(ov), rv.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(oj), rj.numpy(), atol=2e-5)


@pytest.mark.parametrize("global_scale", [None, 1.0 / 125.0])
def test_get_mano_vertices_matches_reference(ref_mano, our_mano, global_scale):
    _, ref = ref_mano
    rng = np.random.RandomState(5)
    B = 4
    beta = rng.randn(B, 10).astype(np.float32)
    theta = rng.randn(B, 45).astype(np.float32)
    rot = rng.uniform(-np.pi, np.pi, (B, 3)).astype(np.float32)
    cam = np.concatenate([np.ones((B, 1)), rng.randn(B, 3) * 20.0],
                         axis=1).astype(np.float32)

    with torch.no_grad():
        rv, rj = ref.get_mano_vertices(torch.tensor(rot), torch.tensor(theta),
                                       torch.tensor(beta), torch.tensor(cam),
                                       global_scale=global_scale)
    ov, oj = mano.get_mano_vertices(our_mano, jnp.asarray(rot),
                                    jnp.asarray(theta), jnp.asarray(beta),
                                    jnp.asarray(cam), global_scale=global_scale)
    # mm scale: 2e-2 mm tolerance = 20 micron, far under the 0.2mm gate
    np.testing.assert_allclose(np.asarray(ov), rv.numpy(), atol=2e-2)
    np.testing.assert_allclose(np.asarray(oj), rj.numpy(), atol=2e-2)


def test_transfer_maps_match_reference(ref_mano):
    m, _ = ref_mano
    from dsf_tpu.mano import constants as C
    assert list(C.MANO2HANDS) == list(m.MANO2HANDS)
    assert list(C.MANO2MSRA) == list(m.MANO2MSRA)
    assert list(C.MANO2ICVL) == list(m.MANO2ICVL)
    assert list(C.MANO2NYU) == list(m.MANO2NYU)
    assert list(C.HANDS2MANO) == list(m.HANDS2MANO)


def test_wrist_faces_match_reference(ref_mano, our_mano):
    _, ref = ref_mano
    np.testing.assert_array_equal(
        np.asarray(our_mano.faces), ref.faces.numpy().astype(np.int32))


# ---------------------------------------------------------------------------
# offset codec (GFM)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_gfm():
    m = load_reference_module("util/generateFeature.py", "ref_generateFeature")
    return m.GFM()


def _rand_img_joints(rng, B=2, J=21, S=128):
    img = rng.uniform(-1, 1, (B, 1, S, S)).astype(np.float32)
    img[img > 0.6] = 1.0  # some background
    joint = rng.uniform(-0.9, 0.9, (B, J, 3)).astype(np.float32)
    return img, joint


def test_joint2offset_matches_reference(ref_gfm):
    rng = np.random.RandomState(7)
    img, joint = _rand_img_joints(rng)
    with torch.no_grad():
        ref = ref_gfm.joint2offset(torch.tensor(joint), torch.tensor(img),
                                   0.8, 64).numpy()
    ours = np.asarray(joint2offset(jnp.asarray(joint), jnp.asarray(img),
                                   0.8, 64))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_offset2joint_softmax_matches_reference(ref_gfm):
    rng = np.random.RandomState(8)
    img, joint = _rand_img_joints(rng)
    with torch.no_grad():
        feat = ref_gfm.joint2offset(torch.tensor(joint), torch.tensor(img),
                                    0.8, 64)
        ref = ref_gfm.offset2joint_softmax(feat, torch.tensor(img), 0.8).numpy()
    ours = np.asarray(offset2joint_softmax(jnp.asarray(feat.numpy()),
                                           jnp.asarray(img), 0.8))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# SmoothL1 (delta=0.01)
# ---------------------------------------------------------------------------

def test_smooth_l1_matches_reference():
    m = load_reference_module("metric/losses.py", "ref_losses")
    rng = np.random.RandomState(9)
    x = rng.randn(4, 21, 3).astype(np.float32) * 0.02
    y = rng.randn(4, 21, 3).astype(np.float32) * 0.02
    with torch.no_grad():
        ref = m.SmoothL1Loss()(torch.tensor(x), torch.tensor(y)).item()
    ours = float(smooth_l1(jnp.asarray(x), jnp.asarray(y)))
    assert abs(ours - ref) < 1e-7


# ---------------------------------------------------------------------------
# crop pipeline (data/render_loader.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_loader():
    m = load_reference_module("data/render_loader.py", "ref_render_loader")
    ld = m.loader("", "train", 128, "refine", "nyu")
    ld.paras = (588.03, 587.07, 320.0, 240.0)
    ld.flip = 1
    ld.aug_modes = ["rot", "com", "sc", "none"]  # as every dataset sets
    return m, ld


def _fake_depth(rng, H=480, W=640, com=(320, 240, 750)):
    depth = np.zeros((H, W), np.float32)
    cu, cv, cz = com
    for _ in range(600):
        u = int(np.clip(cu + rng.randn() * 30, 0, W - 1))
        v = int(np.clip(cv + rng.randn() * 30, 0, H - 1))
        depth[v, u] = cz + rng.randn() * 60
    return depth


def test_crop_image_deep_pp_matches_reference(ref_loader):
    _, ld = ref_loader
    rng = np.random.RandomState(11)
    depth = _fake_depth(rng)
    com = np.array([322.0, 238.0, 751.0], np.float32)
    size = (250.0, 250.0, 250.0)
    ref_img, ref_M = ld.Crop_Image_deep_pp(depth.copy(), com, size,
                                           (128, 128), ld.paras)
    our_img, our_M = dcrop.crop_image_deep_pp(depth.copy(), com, size,
                                              (128, 128), ld.paras)
    np.testing.assert_allclose(our_M, ref_M, atol=1e-6)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-4)


def test_com_to_transform_matches_reference(ref_loader):
    _, ld = ref_loader
    for com in ([322.0, 238.0, 751.0], [100.5, 400.2, 600.0]):
        com = np.asarray(com, np.float32)
        ref_M = ld.comToTransform(com, (250, 250, 250), (128, 128), ld.paras)
        our_M = dcrop.com_to_transform(com, (250, 250, 250), (128, 128),
                                       ld.paras)
        np.testing.assert_allclose(our_M, ref_M, atol=1e-6)


def test_normalize_img_matches_reference(ref_loader):
    _, ld = ref_loader
    rng = np.random.RandomState(12)
    depth = _fake_depth(rng, H=128, W=128, com=(64, 64, 750))
    com = np.array([64.0, 64.0, 750.0], np.float32)
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    ref_out = ld.normalize_img(depth.max(), depth.copy(), com, cube)
    our_out = dcrop.normalize_img(depth.max(), depth.copy(), com, cube)
    np.testing.assert_allclose(our_out, ref_out, atol=1e-6)


@pytest.mark.parametrize("mode", [0, 1, 2, 3])  # rot / com / sc / none
def test_augment_crop_matches_reference(ref_loader, mode):
    m, ld = ref_loader
    rng = np.random.RandomState(13 + mode)
    depth = _fake_depth(rng)
    com_uvd = np.array([322.0, 238.0, 751.0], np.float32)
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    crop, M = ld.Crop_Image_deep_pp(depth, com_uvd, cube, (128, 128), ld.paras)
    joints3d = rng.randn(21, 3).astype(np.float32) * 60.0  # crop-centered mm
    off = rng.uniform(-10, 10, 3).astype(np.float32)
    rot = float(rng.uniform(-180, 180))
    sc = float(1.0 + rng.randn() * 0.05)
    # ref returns (imgD, None, joints3D, cube, com, M, rot); ours drops the
    # None placeholder
    r_img, _, r_j, r_cube, r_com, r_M, r_rot = ld.augmentCrop(
        crop.copy(), joints3d.copy(), com_uvd.copy(), cube.copy(), M.copy(),
        mode, off, rot, sc, ld.paras)
    o_img, o_j, o_cube, o_com, o_M, o_rot = dcrop.augment_crop(
        crop.copy(), joints3d.copy(), com_uvd.copy(), cube.copy(), M.copy(),
        mode, off, rot, sc, ld.paras)
    np.testing.assert_allclose(o_img, r_img, atol=2e-4)
    np.testing.assert_allclose(o_j, r_j, atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_cube, np.float32),
                               np.asarray(r_cube, np.float32), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_com, np.float32),
                               np.asarray(r_com, np.float32), atol=1e-5)
    np.testing.assert_allclose(o_M, r_M, atol=1e-5)
    assert abs(float(o_rot) - float(r_rot)) < 1e-5


# ---------------------------------------------------------------------------
# backbone forward (MANO_OCR, stage-1-only — no renderer in its graph)
# ---------------------------------------------------------------------------

def test_mano_ocr_forward_matches_reference():
    ref_bb = load_reference_module("model/backbone.py", "ref_backbone")
    tnet = ref_bb.MANO_OCR("ResNet_18", 21)
    tnet.eval()

    from dsf_tpu.models.backbone import ManoOCR
    from dsf_tpu.models.torch_import import convert_mano_ocr_stage

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_mano_ocr_stage(sd, refine=False)

    rng = np.random.RandomState(21)
    img = rng.uniform(-1, 1, (2, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.tensor(img))
    ours = ManoOCR(joint_num=21, depth=18).apply(variables, jnp.asarray(img),
                                                 train=False)
    np.testing.assert_allclose(np.asarray(ours[0][0]),
                               ref_out[0][0].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours[0][1]),
                               ref_out[0][1].numpy(), atol=2e-4)


# ---------------------------------------------------------------------------
# hourglass PoseNet forward (alternative backbone, pure torch)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nstack", [1, 2])
def test_pose_net_forward_matches_reference(nstack):
    ref_hg = load_reference_module("model/hourglass.py", "ref_hourglass")
    torch.manual_seed(0)   # unseeded init made the tolerance check flaky
    tnet = ref_hg.PoseNet(nstack, 21)
    tnet.eval()

    from dsf_tpu.models.hourglass import PoseNet
    from dsf_tpu.models.torch_import import convert_pose_net

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_pose_net(sd, nstack=nstack)

    rng = np.random.RandomState(31)
    img = rng.uniform(-1, 1, (2, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_preds, ref_hg_feat = tnet(torch.tensor(img))
    preds, hg_feat = PoseNet(nstack=nstack, joint_num=21).apply(
        variables, jnp.asarray(img), train=False)
    assert len(preds) == nstack
    # f32 conv summation-order noise amplifies through the deep
    # recursive stacks (nstack=1: abs max 1.2e-3 / rel 3e-4; nstack=2:
    # rel max 0.9% after the merge feeds stack 2) — accumulation-order
    # noise, not a wiring bug (that would be O(1) relative)
    for i in range(nstack):
        np.testing.assert_allclose(np.asarray(preds[i]),
                                   ref_preds[i].numpy(), rtol=2e-2,
                                   atol=5e-3)
    np.testing.assert_allclose(np.asarray(hg_feat),
                               ref_hg_feat.numpy(), rtol=2e-2, atol=5e-3)
