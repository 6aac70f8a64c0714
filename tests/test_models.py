"""Model tests: torch layer parity, full two-stage forward, generator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu.models import layers as L
from dsf_tpu.models.backbone import ManoOCR, ManoOCRStage
from dsf_tpu.models.cyclegan import ResnetGenerator
from dsf_tpu.models.hourglass import PoseNet


def test_conv_transpose_matches_torch_k4s2p1():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 16, 16).astype(np.float32)
    w = rng.randn(8, 4, 4, 4).astype(np.float32) * 0.1   # (in, out, kh, kw)

    tconv = torch.nn.ConvTranspose2d(8, 4, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
    expected = tconv(torch.from_numpy(x)).detach().numpy()

    mod = L.ConvTranspose(features=4, kernel=4, stride=2, padding=1)
    # flax kernel (kh, kw, in, out) with transpose_kernel=True; data NHWC
    params = {"params": {"deconv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}}
    got = np.asarray(mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert got.shape == expected.shape == (2, 4, 32, 32)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_conv_transpose_matches_torch_k3s2p1op1():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 10, 10).astype(np.float32)
    w = rng.randn(6, 3, 3, 3).astype(np.float32) * 0.1

    tconv = torch.nn.ConvTranspose2d(6, 3, 3, stride=2, padding=1,
                                     output_padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
    expected = tconv(torch.from_numpy(x)).detach().numpy()

    mod = L.ConvTranspose(features=3, kernel=3, stride=2, padding=1,
                          output_padding=1)
    params = {"params": {"deconv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}}
    got = np.asarray(mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert got.shape == expected.shape == (1, 3, 20, 20)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_maxpool_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 9, 9).astype(np.float32)
    expected = torch.nn.MaxPool2d(3, 2, 1)(torch.from_numpy(x)).numpy()
    got = np.asarray(L.max_pool_3x3_s2(
        jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def _make_renderer():
    from dsf_tpu.mano import model as mano_model, synthetic
    from dsf_tpu.render import Renderer
    import tempfile, os
    path = os.path.join(tempfile.gettempdir(), "syn_mano_models_test.npz")
    if not os.path.exists(path):
        synthetic.save_synthetic_mano(path)
    m = mano_model.load_model(path)
    return Renderer.create(m, "nyu", (588.03, 587.07, 320.0, 240.0), (640, 480))


def test_mano_ocr_single_stage_shapes():
    net = ManoOCR(joint_num=21)
    x = jnp.zeros((2, 1, 128, 128))
    vars_ = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(vars_, x, train=False)
    assert len(out) == 1
    img_result, mano_para = out[0]
    assert img_result.shape == (2, 84, 64, 64)
    assert mano_para.shape == (2, 62)


def test_mano_ocr_stage_two_stage_shapes():
    r = _make_renderer()
    net = ManoOCRStage(joint_num=21, refine=True)
    x = jnp.zeros((2, 1, 128, 128))
    center = jnp.asarray([[0.0, 0.0, 750.0]] * 2)
    cube = jnp.full((2, 3), 250.0)
    vars_ = net.init(jax.random.PRNGKey(0), x, r, center, cube, train=False)
    out = net.apply(vars_, x, r, center, cube, train=False)
    assert len(out) == 2
    for img_result, mano_para in out:
        assert img_result.shape == (2, 84, 64, 64)
        assert mano_para.shape == (2, 62)
    # batch stats exist (BN state) for both stages
    assert "batch_stats" in vars_


def test_cyclegan_generator():
    net = ResnetGenerator()
    x = jnp.zeros((1, 1, 128, 128))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(vars_, x)
    assert y.shape == (1, 1, 128, 128)
    assert float(jnp.abs(y).max()) <= 1.0


def test_hourglass_posenet():
    net = PoseNet(nstack=2, joint_num=14)
    x = jnp.zeros((1, 1, 128, 128))
    vars_ = net.init(jax.random.PRNGKey(0), x, train=False)
    preds, hg = net.apply(vars_, x, train=False)
    assert len(preds) == 2
    assert preds[0].shape == (1, 14 * 5, 32, 32)
    assert hg.shape == (1, 256, 32, 32)


def test_bn_groups2_equals_two_sequential_calls():
    """The stacked [synth | real] 2B forward with bn_groups=2 must equal
    two sequential B-batch applies bit-for-bit-ish: per-half outputs AND
    the composed running-stat EMA (layers.BatchNorm groups semantics)."""
    r = _make_renderer()
    rng = np.random.RandomState(0)
    B = 2
    img_a = jnp.asarray(rng.uniform(-1, 1, (B, 1, 64, 64)).astype(np.float32))
    img_b = jnp.asarray(rng.uniform(-1, 1, (B, 1, 64, 64)).astype(np.float32))
    center = jnp.asarray([[0.0, 0.0, 750.0]] * B)
    cube = jnp.full((B, 3), 250.0)

    net1 = ManoOCRStage(joint_num=21, refine=True)
    net2 = net1.clone(bn_groups=2)
    vars_ = net1.init(jax.random.PRNGKey(0), img_a, r, center, cube,
                      train=False)

    # sequential: synth call then real call, EMA threading through
    out_a, mut1 = net1.apply(vars_, img_a, r, center, cube, train=True,
                             mutable=["batch_stats"])
    vars1 = {"params": vars_["params"],
             "batch_stats": mut1["batch_stats"]}
    out_b, mut2 = net1.apply(vars1, img_b, r, center, cube, train=True,
                             mutable=["batch_stats"])

    # stacked groups=2
    out_2b, mut_2b = net2.apply(
        vars_, jnp.concatenate([img_a, img_b]), r,
        jnp.concatenate([center, center]), jnp.concatenate([cube, cube]),
        train=True, mutable=["batch_stats"])

    for idx in range(2):
        for j in range(2):
            np.testing.assert_allclose(
                np.asarray(out_2b[idx][j][:B]), np.asarray(out_a[idx][j]),
                rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(out_2b[idx][j][B:]), np.asarray(out_b[idx][j]),
                rtol=2e-5, atol=2e-5)
    flat_seq = jax.tree_util.tree_leaves(mut2["batch_stats"])
    flat_stk = jax.tree_util.tree_leaves(mut_2b["batch_stats"])
    for a, b in zip(flat_seq, flat_stk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_remat_flag_is_bitwise_neutral(monkeypatch):
    """DSF_REMAT=1 (activation rematerialization of trunk/heads) must not
    change the variable tree, outputs, batch_stats, or gradients — it is
    a pure schedule change (models/backbone.py:_maybe_remat)."""
    net = ManoOCRStage(joint_num=21, refine=False, bn_groups=2)
    x = jnp.asarray(np.random.RandomState(3).randn(4, 1, 32, 32)
                    .astype(np.float32))

    monkeypatch.setenv("DSF_REMAT", "0")
    v = net.init(jax.random.PRNGKey(0), x, train=True)
    out0, mut0 = net.apply(v, x, train=True, mutable=["batch_stats"])

    def loss(params):
        out, _ = net.apply({"params": params,
                            "batch_stats": v["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(l ** 2) for l in jax.tree_util.tree_leaves(out))

    g0 = jax.grad(loss)(v["params"])

    monkeypatch.setenv("DSF_REMAT", "1")
    v1 = net.init(jax.random.PRNGKey(0), x, train=True)
    out1, mut1 = net.apply(v, x, train=True, mutable=["batch_stats"])
    g1 = jax.grad(loss)(v["params"])

    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves((out0, mut0, g0)),
                    jax.tree_util.tree_leaves((out1, mut1, g1))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
