"""Whole-phase integration A/B against the reference's ACTUAL training code.

Two layers of de-risking that unit-level parity tests cannot give:

* ``test_reference_warp_image_chain_vs_crop_ray`` — the reference's
  genuine full-frame -> warpPerspective -> normalize_img IMAGE chain
  (render_model/mano_layer.py:1021-1030, 1244-1299), fed by a real
  full-frame zbuf from this repo's rasterizer, compared against our
  direct crop-ray rendering (a redesign, never before compared
  image-to-image).  pytorch3d itself is absent here, so its square-
  raster + nearest vertical squeeze is approximated by rasterizing the
  640x480 frame directly (resize patched to identity); the comparison
  still exercises every line of the reference's torch compositing.

* ``test_pretrain_phase_matches_reference`` /
  ``test_finetune_phase_matches_reference`` — the reference
  ``Trainer.Pretrain`` / ``Trainer.Finetune`` method bodies
  (train_render.py:415-488, 490-619) run UNMODIFIED on a shim trainer
  whose RenderNet is this repo's renderer bridged into the reference
  API (so both sides consume bit-identical renders), the same
  weight-converted net, the same augmentation draws, and a shared
  deterministic cloud sampler — then every loss/error term and the
  total loss must match ``phases.pretrain_loss``/``phases.finetune_loss``.
  This also demonstrates the renderer is a drop-in replacement for the
  reference's pytorch3d render stack.
"""

import os
import types

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from reference_import import load_reference_module
from test_reference_parity_losses import (_FakeMeshes, _FakePointclouds,
                                          _our_point_face_distance)

from dsf_tpu.mano import model as mano_model, synthetic
from dsf_tpu.mano.constants import MANO2NYU
import dsf_tpu.render.renderer as rnd
import dsf_tpu.geometry as geo
from dsf_tpu.ops import cloud
from dsf_tpu.ops import rasterize as Rz
from dsf_tpu.training import phases
from dsf_tpu.models.backbone import ManoOCR, ManoOCRStage
from dsf_tpu.models.torch_import import convert_mano_ocr_stage
from dsf_tpu.config import Config

NYU = (588.03, 587.07, 320.0, 240.0)
B = 4


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
def our_mano(assets):
    return mano_model.load_model(assets[1])


@pytest.fixture(scope="module")
def our_renderer(our_mano):
    return rnd.Renderer.create(our_mano, "nyu", NYU, (640, 480))


@pytest.fixture(scope="module")
def ref_train(assets):
    """The reference train_render module with its CUDA-only deps bridged:
    meshLoss's point_face_distance runs on this repo's exact distance op
    (same shim the per-loss A/B tests use)."""
    mod = load_reference_module("train_render.py", "ref_train_render")
    import sys
    ml = sys.modules["metric.meshLoss"]
    ml.point_face_distance = _our_point_face_distance
    ml.Meshes = _FakeMeshes
    ml.Pointclouds = _FakePointclouds
    return mod


@pytest.fixture(scope="module")
def ref_mano_smpl(assets, ref_train):
    m = load_reference_module("render_model/mano_layer.py", "ref_mano_layer")
    return m, m.MANO_SMPL(assets[0], "nyu")


# ---------------------------------------------------------------------------
# the RenderNet bridge: this repo's renderer in the reference's API
# ---------------------------------------------------------------------------

def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _j(x):
    return None if x is None else jnp.asarray(x.detach().numpy())


class _BridgedRenderNet:
    """Drop-in for the reference `Render` module backed by dsf_tpu.

    `mano_layer` stays the REFERENCE MANO_SMPL so the phase body's
    calculate_coll / seg_pcl / faces / transfer run the reference's own
    code over the bridged geometry.
    """

    def __init__(self, r, mano_layer, k_synth):
        self.r, self.mano_layer, self.k_synth = r, mano_layer, k_synth

    def __call__(self, model_para, center3d, cube, augmentView=None,
                 augmentShape=None, augmentCenter=None, augmentSize=None,
                 mask=False):
        out = rnd.synth_sample(
            self.r, self.k_synth, _j(model_para), _j(cube),
            center3d=_j(center3d), augment_view=_j(augmentView),
            augment_shape=_j(augmentShape), augment_center=_j(augmentCenter),
            augment_size=_j(augmentSize), mask=mask)
        return tuple(_t(x) for x in out)

    def render(self, para, center, cube):
        out = rnd.render_params(self.r, _j(para), _j(center), _j(cube))
        return tuple(_t(x) for x in out)

    def get_mesh_xyz(self, para):
        j, v = rnd.get_mesh_xyz(self.r, _j(para))
        return _t(j), _t(v)


class _OptStub:
    def zero_grad(self):
        pass

    def step(self):
        pass


def _patch_torch_draws(monkeypatch, shape_aug, center_aug, size_aug,
                       view_aug):
    """Feed the reference phase body's 4 augmentation draws
    (train_render.py:497-500) the exact values our side is patched to
    use, inverting each draw's affine transform."""
    randn_q = [torch.tensor(shape_aug / 3.0)]
    rand_q = [torch.tensor(center_aug / 40.0 + 0.5),
              torch.tensor((size_aug - 1.0) / 0.4 + 0.5),
              torch.tensor(view_aug / (2.0 * np.pi))]
    monkeypatch.setattr(torch, "randn", lambda *a, **k: randn_q.pop(0))
    monkeypatch.setattr(torch, "rand", lambda *a, **k: rand_q.pop(0))


def _capture_backward(monkeypatch, sink):
    def rec(self, *a, **k):
        sink["loss"] = float(self.detach())
    monkeypatch.setattr(torch.Tensor, "backward", rec)


def _deterministic_sampler(monkeypatch):
    orig = cloud.img_to_pcl
    monkeypatch.setattr(
        cloud, "img_to_pcl", lambda key, *a, **k: orig(None, *a, **k))
    return orig


def _aug_draws(rng):
    shape_aug = (rng.randn(B, 10) * 3).astype(np.float32)
    center_aug = ((rng.rand(B, 3) - 0.5) * 40).astype(np.float32)
    size_aug = (1 + (rng.rand(B, 1) - 0.5) * 0.4).astype(np.float32)
    view_aug = (rng.rand(B, 3) * 2 * np.pi).astype(np.float32)
    return shape_aug, center_aug, size_aug, view_aug


def _patch_our_aug(monkeypatch, shape_aug, center_aug, size_aug, view_aug,
                   k_synth):
    vals = (jnp.asarray(shape_aug), jnp.asarray(center_aug),
            jnp.asarray(size_aug), jnp.asarray(view_aug), k_synth,
            jax.random.PRNGKey(99))
    monkeypatch.setattr(phases, "_aug_keys", lambda key, b: vals)


def _model_para(rng, n=B):
    return np.concatenate(
        [rng.uniform(-1, 1, (n, 3)), rng.randn(n, 45) * 0.5,
         rng.randn(n, 10) * 0.5, np.ones((n, 1)),
         np.zeros((n, 3))], axis=1).astype(np.float32)


def _make_nets():
    torch.manual_seed(7)
    # the trainer always builds MANO_OCR_stage (train_render.py:89);
    # refine=False is the 1-stage configuration
    tnet = __import__("sys").modules["ref_train_render"].MANO_OCR_stage(
        "ResNet_stage_18", 21, False)
    tnet.eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_mano_ocr_stage(sd, refine=False)
    net = ManoOCR(joint_num=21, depth=18)

    def apply_fn(variables, img, rend, center, cube, train, mutable=None):
        return net.apply(variables, img, train=train)

    return tnet, variables, apply_fn


def _make_shim(ref_train, our_renderer, ref_smpl, tnet, k_synth):
    opt = ref_train.opt
    opt.tansferNet_pth = ""
    opt.mask = False
    opt.dataset = "nyu"
    opt.stage_num = 1
    opt.feature_type = ["offset"]
    opt.feature_para = [0.8]

    shim = types.SimpleNamespace()
    shim.config = opt
    shim.phase = "train"
    shim.optimizer = _OptStub()
    shim.net = tnet
    shim.transferNet = None
    shim.GFM_ = ref_train.GFM()
    shim.L1Loss = ref_train.SmoothL1Loss()
    shim.RenderNet = _BridgedRenderNet(our_renderer, ref_smpl, k_synth)
    ld = ref_train.render_loader.loader("", "train", 128, "refine", "nyu")
    # the dataset subclasses set these (e.g. nyu_loader, render_loader.py:1811)
    ld.flip = 1
    ld.paras = NYU
    ld.ori_img_size = (640, 480)

    def bridged_img2pcl(img, feature_size, center, M, cube, sample_num=1024):
        out = cloud.img_to_pcl(
            None, _j(img), _j(center), _j(M), _j(cube), NYU, 128,
            sample_num=sample_num, feature_size=feature_size, flip=1.0)
        return _t(out)

    ld.Img2pcl = bridged_img2pcl
    shim.trainData = ld
    shim.xyz2error = types.MethodType(ref_train.Trainer.xyz2error, shim)
    return shim


def _our_cfg():
    return Config(dataset="nyu", mask=False, stage_num=1, phase="train")


# ---------------------------------------------------------------------------
# tier 1: the image chain itself
# ---------------------------------------------------------------------------

class _Fragments:
    def __init__(self, zbuf):
        self.zbuf = zbuf


def test_reference_warp_image_chain_vs_crop_ray(assets, our_mano,
                                                our_renderer, ref_mano_smpl):
    """Full-frame raster -> (identity resize) -> reference warpPerspective
    -> reference normalize_img  vs  our direct crop-ray render.

    The two paths sample the surface at sub-pixel-different ray
    positions (the reference's nearest-warp quantizes to source pixel
    centers; ours shoots the exact M^-1 ray).  The strong assertion is
    therefore the QUANTIZED emulation: rastering at the reference's
    exact nearest source-pixel positions must reproduce the reference's
    whole compositing chain almost bitwise; the continuous production
    render is then only held to bounded deviation stats (the residual
    is half-pixel surface-slope discretization at slanted surfaces and
    silhouette edges, measured 2026-08-17: 99.99% / 92.7% of pixels
    within 1e-3 / 0.02 respectively)."""
    m, _ = ref_mano_smpl
    nB = 2
    orig_t_cuda = torch.Tensor.cuda
    orig_m_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        rend = m.Render(os.path.dirname(assets[0]), "nyu", NYU, (640, 480))
    finally:
        torch.Tensor.cuda = orig_t_cuda
        torch.nn.Module.cuda = orig_m_cuda

    rays = Rz.full_frame_pixel_rays((640, 480))
    r = our_renderer

    class _Raster:
        def __call__(self, meshes):
            verts = torch.stack(meshes.verts).numpy()
            z = Rz.rasterize_depth(jnp.asarray(verts), our_mano.faces, rays,
                                   NYU, flip=r.flip)
            z = np.asarray(z).reshape(nB, 480, 640, 1)
            return _Fragments(torch.tensor(
                np.where(z <= 0, -1.0, z).astype(np.float32)))

    prev_meshes = m.Meshes
    m.Meshes = _FakeMeshes
    rend.rasterizer = _Raster()
    rend.resize = lambda img: img
    try:
        rng = np.random.RandomState(11)
        para = _model_para(rng, nB)
        center = rng.uniform([-50, -50, 650], [50, 50, 900],
                             (nB, 3)).astype(np.float32)
        cube = np.full((nB, 3), 250.0, np.float32)
        with torch.no_grad():
            ref_img = rend.render(torch.tensor(para), torch.tensor(center),
                                  torch.tensor(cube))[0].numpy()
        our_img = np.asarray(rnd.render_params(
            r, jnp.asarray(para), jnp.asarray(center), jnp.asarray(cube))[0])
    finally:
        m.Meshes = prev_meshes

    # --- strong: raster at the reference's exact quantized sample
    # positions == the reference's whole resize/warp/normalize chain
    cen_uvd = geo.xyz_to_uvd(jnp.asarray(center), NYU)
    M = geo.crop_matrix(cen_uvd, jnp.asarray(cube), NYU, (128, 128))
    crop_rays = np.asarray(Rz.crop_pixel_rays(M, (128, 128)))
    # F.grid_sample(nearest, align_corners=False): src index =
    # nearbyint(pos - 0.5)  (mano_layer.py:1244-1260)
    q = jnp.asarray(np.rint(crop_rays - 0.5).astype(np.float32))
    rot, pose, shape, cam = mano_model.split_params(jnp.asarray(para))
    verts, _ = mano_model.get_mano_vertices(
        our_mano, rot, pose, shape, cam, global_scale=1 / 125)
    verts = verts * jnp.asarray(cube)[:, None] / 2 + jnp.asarray(center)[:, None]
    zq = np.asarray(Rz.rasterize_depth(verts, our_mano.faces, q, NYU,
                                       flip=r.flip)).reshape(nB, 1, 128, 128)
    zmin = (center[:, 2] - cube[:, 2] / 2)[:, None, None, None]
    zmax = (center[:, 2] + cube[:, 2] / 2)[:, None, None, None]
    zq = np.clip(np.where(zq <= 0, zmax, zq), zmin, zmax)
    emul = (zq - center[:, 2][:, None, None, None]) / (
        cube[:, 2][:, None, None, None] / 2)
    dq = np.abs(ref_img - emul)
    assert (dq < 1e-3).mean() > 0.999, \
        f"quantized emulation: only {(dq < 1e-3).mean():.5f} within 1e-3"

    # --- bounded: the continuous-ray production render deviates only by
    # sub-pixel discretization
    diff = np.abs(ref_img - our_img)
    frac_close = (diff < 0.02).mean()
    assert frac_close > 0.9, f"only {frac_close:.4f} of pixels within 0.02"
    assert diff.mean() < 0.05, f"mean abs diff {diff.mean():.5f}"
    # foreground masks agree except in the ~1px silhouette band where
    # the half-pixel sampling offset flips coverage (measured 2.5% of
    # all pixels = ~9% of foreground, i.e. the perimeter band)
    fg_ref = ref_img < 0.99
    fg_our = our_img < 0.99
    assert (fg_ref ^ fg_our).mean() < 0.04


# ---------------------------------------------------------------------------
# tier 2: whole phase bodies
# ---------------------------------------------------------------------------

def test_pretrain_phase_matches_reference(monkeypatch, ref_train,
                                          our_renderer, ref_mano_smpl):
    _, ref_smpl = ref_mano_smpl
    tnet, variables, apply_fn = _make_nets()
    k_synth = jax.random.PRNGKey(3)
    shim = _make_shim(ref_train, our_renderer, ref_smpl, tnet, k_synth)

    rng = np.random.RandomState(17)
    para = _model_para(rng)
    cube = np.full((B, 3), 250.0, np.float32)
    shape_aug, center_aug, size_aug, view_aug = _aug_draws(rng)

    captured = {}
    _capture_backward(monkeypatch, captured)
    _patch_torch_draws(monkeypatch, shape_aug, center_aug, size_aug, view_aug)
    _, _, _, scalars, names = ref_train.Trainer.Pretrain(
        shim, torch.tensor(para), torch.tensor(cube))
    ref_vals = dict(zip(names, [float(s) for s in scalars]))
    ref_loss = captured["loss"]

    # pretrain zeroes the view augmentation (ref :424)
    _patch_our_aug(monkeypatch, shape_aug, center_aug, size_aug,
                   np.zeros_like(view_aug), k_synth)
    _deterministic_sampler(monkeypatch)
    loss, (_, metrics) = phases.pretrain_loss(
        apply_fn, variables, jax.random.PRNGKey(0), jnp.asarray(para),
        jnp.asarray(cube), r=our_renderer, transfer_fn=None, cfg=_our_cfg(),
        stage_num=1, train=False)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=5e-3)
    np.testing.assert_allclose(float(metrics["pixel_error_0"]),
                               ref_vals["Pixel-Error_0"], rtol=5e-3)
    np.testing.assert_allclose(float(metrics["mano_error_0"]),
                               ref_vals["MANO-Error_0"], rtol=5e-3)
    np.testing.assert_allclose(float(metrics["scale_loss_0"]),
                               ref_vals["scale-loss0"], rtol=5e-3, atol=1e-7)


def _make_stage_net():
    """Reference 2-stage MANO_OCR_stage (refine=True) + converted
    variables + an apply_fn over our ManoOCRStage."""
    torch.manual_seed(9)
    tnet = __import__("sys").modules["ref_train_render"].MANO_OCR_stage(
        "ResNet_stage_18", 21, True)
    tnet.eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_mano_ocr_stage(sd, refine=True)
    net = ManoOCRStage(joint_num=21, depth=18, refine=True)

    def apply_fn(variables, img, rend, center, cube, train, mutable=None):
        return net.apply(variables, img, rend, center, cube, train=train)

    return tnet, variables, apply_fn


def test_finetune_stage_phase_matches_reference(monkeypatch, ref_train,
                                                our_renderer, ref_mano_smpl):
    """The production default: the reference's ACTUAL 2-stage
    ``Trainer.FinetuneStage`` body (train_render.py:622-823) — whose net
    forward itself renders the stage-1 MANO prediction through the
    bridged renderer (backbone.py:304) — vs ``phases.finetune_stage_loss``
    (stacked 2B forward + stage-stacked loss tensors), term by term."""
    _, ref_smpl = ref_mano_smpl
    tnet, variables, apply_fn = _make_stage_net()
    k_synth = jax.random.PRNGKey(8)
    shim = _make_shim(ref_train, our_renderer, ref_smpl, tnet, k_synth)
    shim.config.stage_num = 2
    # FinetuneStage applies the transfer net unconditionally (ref :639)
    shim.transferNet = lambda x: x
    r = our_renderer

    rng = np.random.RandomState(31)
    para = _model_para(rng)
    cube = np.full((B, 3), 250.0, np.float32)
    shape_aug, center_aug, size_aug, view_aug = _aug_draws(rng)

    para_r = _model_para(rng)
    center_r = rng.uniform([-50, -50, 650], [50, 50, 900],
                           (B, 3)).astype(np.float32)
    cube_r = np.full((B, 3), 250.0, np.float32)
    M_r = np.asarray(geo.crop_matrix(
        geo.xyz_to_uvd(jnp.asarray(center_r), NYU), jnp.asarray(cube_r),
        NYU, (128, 128)))
    img_r = np.asarray(rnd.render_params(
        r, jnp.asarray(para_r), jnp.asarray(center_r),
        jnp.asarray(cube_r))[0]).astype(np.float32)
    xyz_gt_r = rng.uniform(-1, 1, (B, 14, 3)).astype(np.float32)

    captured = {}
    _capture_backward(monkeypatch, captured)
    _patch_torch_draws(monkeypatch, shape_aug, center_aug, size_aug, view_aug)
    out = ref_train.Trainer.FinetuneStage(
        shim, torch.tensor(para), torch.tensor(cube), torch.tensor(img_r),
        torch.tensor(center_r), torch.tensor(cube_r), torch.tensor(M_r),
        torch.tensor(xyz_gt_r))
    ref_vals = dict(zip(out[4], [float(s) for s in out[3]]))
    ref_loss = captured["loss"]

    _patch_our_aug(monkeypatch, shape_aug, center_aug, size_aug, view_aug,
                   k_synth)
    _deterministic_sampler(monkeypatch)
    cfg = Config(dataset="nyu", mask=False, stage_num=2, phase="train")
    loss, (_, metrics) = phases.finetune_stage_loss(
        apply_fn, variables, jax.random.PRNGKey(0), jnp.asarray(para),
        jnp.asarray(cube), jnp.asarray(img_r), jnp.asarray(center_r),
        jnp.asarray(cube_r), jnp.asarray(M_r), jnp.asarray(xyz_gt_r),
        r=r, transfer_fn=None, cfg=cfg, transfer_map=MANO2NYU,
        train=False)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=5e-3)
    pairs = [("pixel_error_0", "PixelError0", 5e-3, 0.0),
             ("pixel_error_1", "PixelError1", 5e-3, 0.0),
             ("mano_error_0", "MANOError0", 5e-3, 0.0),
             ("mano_error_1", "MANOError1", 5e-3, 0.0),
             ("P2M", "P2M", 5e-3, 1e-6),
             ("m2d_1", "m2d", 5e-3, 1e-6),
             ("d2m_1", "d2m", 1e-2, 1e-6),
             ("pd2m_1", "pd2m", 1e-2, 1e-6),
             ("M2P", "M2P", 1e-2, 1e-6),
             # coll is a 0.1-gated hinge sum over ~2k sphere pairs: the
             # ~2e-4 torch-vs-jax net-output drift flips near-threshold
             # pairs, moving the small total by a few percent (identical-
             # input parity is tested tightly in
             # test_reference_parity_losses::test_calculate_coll)
             ("coll_1", "coll", 5e-2, 1e-3)]
    for ours_k, ref_k, rtol, atol in pairs:
        np.testing.assert_allclose(
            float(metrics[ours_k]), ref_vals[ref_k], rtol=rtol, atol=atol,
            err_msg=f"loss term {ref_k}")


def test_eval_path_matches_reference(tmp_path, assets, ref_train,
                                     our_renderer, ref_mano_smpl):
    """tier 3: the eval protocol.  The reference's ACTUAL ``test_iter``
    body (train_render.py:355-400, incl. its result/mesh/MANO txt
    exports) runs over the same on-disk fake-NYU batches as the
    production eval path (``Trainer.eval_step_fn`` + ``loop._test_view``
    with drop_last=False pad-and-mask) — per-stage per-branch mm errors
    and the exported txt files must match, including the padded tail
    batch (6 frames at batch 4)."""
    from dsf_tpu.data.fake import make_fake_nyu
    from dsf_tpu.data import datasets as D
    from dsf_tpu.parallel import mesh as pmesh
    from dsf_tpu.training.trainer import Trainer as OurTrainer
    from dsf_tpu.training import loop as L

    _, ref_smpl = ref_mano_smpl
    tnet, variables, _ = _make_stage_net()

    root = make_fake_nyu(str(tmp_path / "data"), assets[1], n_train=2,
                         n_test=6)
    cfg = Config(dataset="nyu", stage_num=2, phase="test", batch_size=4,
                 root_dir=root, mano_model_path=assets[1],
                 save_result=True, save_mesh=True, save_obj=False)
    # 1-device mesh: batch 4 is not divisible by the conftest's 8-CPU mesh
    tr = OurTrainer(cfg, assets[1], steps_per_epoch=1,
                    mesh=pmesh.make_mesh(1))
    state = tr.init_state()
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir, exist_ok=True)
    ours_errs = np.asarray(L._test_view(tr, state, cfg, 0, run_dir))

    # ---- reference side: the same batches through the real test_iter
    shim = _make_shim(ref_train, our_renderer, ref_smpl, tnet,
                      jax.random.PRNGKey(0))
    shim.config.stage_num = 2
    shim.config.save_result = True
    shim.config.save_mesh = True
    shim.config.save_obj = False
    shim.testData = shim.trainData
    shim.result_file_list = [
        open(tmp_path / f"ref_result_{i}_0.txt", "w") for i in range(4)]
    shim.mano_file = open(tmp_path / "ref_mano.txt", "w")
    shim.mesh_file = open(tmp_path / "ref_mesh.txt", "w")
    shim.coll_file = open(tmp_path / "ref_coll.txt", "w")

    ds = D.NYUDataset(os.path.join(root, "nyu"), "test", view=0,
                      img_size=cfg.input_size, cube_size=cfg.cube_size,
                      center_type=cfg.center_type)
    totals, n = np.zeros(4), 0
    with torch.no_grad():
        for ii, b in enumerate(ds.prefetch_batches(cfg.batch_size,
                                                   shuffle=False,
                                                   drop_last=False)):
            err = ref_train.Trainer.test_iter(
                shim, _t(b["img"]), _t(b["xyz_gt"]), _t(b["center"]),
                _t(b["cube"]), _t(b["M"]), ii, 0)
            valid = len(b["img"])
            totals += np.asarray([float(e) for e in err]) * valid
            n += valid
    for fh in shim.result_file_list + [shim.mano_file, shim.mesh_file,
                                       shim.coll_file]:
        fh.close()
    ref_errs = totals / n

    np.testing.assert_allclose(ours_errs, ref_errs, rtol=5e-3,
                               err_msg="per-stage per-branch mm errors")

    # ---- exported files: all 6 frames present, rows match (both %.3f)
    for ours_name, ref_name in [("result_0_0.txt", "ref_result_0_0.txt"),
                                ("result_1_0.txt", "ref_result_1_0.txt"),
                                ("mesh_result_3_0.txt", "ref_mesh.txt"),
                                ("MANO_result_3_0.txt", "ref_mano.txt")]:
        ours = np.loadtxt(os.path.join(run_dir, ours_name))
        ref = np.loadtxt(tmp_path / ref_name)
        assert ours.shape == ref.shape and ours.shape[0] == 6, \
            f"{ours_name}: {ours.shape} vs {ref.shape}"
        # both sides print %.3f; the underlying values differ by the
        # torch-vs-jax net tolerance (~2e-4 normalized, amplified to
        # ~0.1 mm through LBS + cube scaling) — hold every row to well
        # under BASELINE.md's 0.2 mm parity gate
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=0.15,
                                   err_msg=ours_name)
    # result files 2,3 exist but are empty on both sides (the reference
    # writes only indices 0/1 — the save block sits outside the stage
    # loop, train_render.py:394-398)
    for i in (2, 3):
        assert os.path.getsize(os.path.join(run_dir,
                                            f"result_{i}_0.txt")) == 0
        assert os.path.getsize(tmp_path / f"ref_result_{i}_0.txt") == 0


def test_finetune_phase_matches_reference(monkeypatch, ref_train,
                                          our_renderer, ref_mano_smpl):
    _, ref_smpl = ref_mano_smpl
    tnet, variables, apply_fn = _make_nets()
    k_synth = jax.random.PRNGKey(5)
    shim = _make_shim(ref_train, our_renderer, ref_smpl, tnet, k_synth)
    r = our_renderer

    rng = np.random.RandomState(23)
    para = _model_para(rng)
    cube = np.full((B, 3), 250.0, np.float32)
    shape_aug, center_aug, size_aug, view_aug = _aug_draws(rng)

    # a realistic real batch: rendered hands (identical bits both sides)
    para_r = _model_para(rng)
    center_r = rng.uniform([-50, -50, 650], [50, 50, 900],
                           (B, 3)).astype(np.float32)
    cube_r = np.full((B, 3), 250.0, np.float32)
    M_r = np.asarray(geo.crop_matrix(
        geo.xyz_to_uvd(jnp.asarray(center_r), NYU), jnp.asarray(cube_r),
        NYU, (128, 128)))
    img_r = np.asarray(rnd.render_params(
        r, jnp.asarray(para_r), jnp.asarray(center_r),
        jnp.asarray(cube_r))[0]).astype(np.float32)
    xyz_gt_r = rng.uniform(-1, 1, (B, 14, 3)).astype(np.float32)

    captured = {}
    _capture_backward(monkeypatch, captured)
    _patch_torch_draws(monkeypatch, shape_aug, center_aug, size_aug, view_aug)
    out = ref_train.Trainer.Finetune(
        shim, torch.tensor(para), torch.tensor(cube), torch.tensor(img_r),
        torch.tensor(center_r), torch.tensor(cube_r), torch.tensor(M_r),
        torch.tensor(xyz_gt_r))
    ref_vals = dict(zip(out[4], [float(s) for s in out[3]]))
    ref_loss = captured["loss"]

    _patch_our_aug(monkeypatch, shape_aug, center_aug, size_aug, view_aug,
                   k_synth)
    _deterministic_sampler(monkeypatch)
    loss, (_, metrics) = phases.finetune_loss(
        apply_fn, variables, jax.random.PRNGKey(0), jnp.asarray(para),
        jnp.asarray(cube), jnp.asarray(img_r), jnp.asarray(center_r),
        jnp.asarray(cube_r), jnp.asarray(M_r), jnp.asarray(xyz_gt_r),
        r=r, transfer_fn=None, cfg=_our_cfg(), transfer_map=MANO2NYU,
        train=False)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=5e-3)
    pairs = [("pixel_error", "PixelError", 5e-3, 0.0),
             ("mano_error", "ManoError", 5e-3, 0.0),
             ("m2d", "m2d", 5e-3, 1e-6),
             ("pd2m", "pd2m", 1e-2, 1e-6),
             ("P2M", "P2M", 5e-3, 1e-6),
             ("coll", "coll", 1e-2, 1e-6),
             ("M2P", "M2P", 1e-2, 1e-6),
             ("d2m", "d2m", 1e-2, 1e-6)]
    for ours_k, ref_k, rtol, atol in pairs:
        np.testing.assert_allclose(
            float(metrics[ours_k]), ref_vals[ref_k], rtol=rtol, atol=atol,
            err_msg=f"loss term {ref_k}")
