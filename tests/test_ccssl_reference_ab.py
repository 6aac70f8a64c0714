"""Live-reference A/B for the CCSSL TTA pseudo-labelers.

Runs the reference's ACTUAL TTA code — ``CCSSL/consistency.py``'s
score-map-averaging ``prediction_check_pytorch`` and ``CCSSL/consis.py``'s
joint-averaging ``prediction_check`` — against this repo's
``tools.ccssl`` ops with a shared deterministic stub net and patched
augmentation draws.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from reference_import import load_reference_module
from dsf_tpu.tools import ccssl

B, J, S = 2, 21, 128
N_AUG = 3


def _load_ref(relpath, name):
    """CCSSL/imutils.py:168 calls .cuda() in a module-level default
    argument; stub it for the import."""
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        return load_reference_module(relpath, name)
    finally:
        torch.Tensor.cuda = orig


@pytest.fixture(scope="module")
def stub():
    """A deterministic 'net': 2x2 mean-pool the image, scale per channel.
    Exercises the warps (output depends on the augmented frame) and is
    expressible identically in torch and jax."""
    w = np.random.RandomState(5).uniform(0.5, 1.5, (4 * J,)).astype(np.float32)

    class TorchModel:
        def __call__(self, img):
            pooled = torch.nn.functional.avg_pool2d(img, 2)
            out = pooled * torch.tensor(w).view(1, 4 * J, 1, 1)
            return [[out, None]]

    def jax_forward(img):
        Bc = img.shape[0]
        pooled = img.reshape(Bc, 1, S // 2, 2, S // 2, 2).mean(axis=(3, 5))
        return pooled * jnp.asarray(w).reshape(1, 4 * J, 1, 1)

    return TorchModel(), jax_forward


@pytest.fixture
def img():
    rng = np.random.RandomState(7)
    im = np.ones((B, 1, S, S), np.float32)
    # a soft foreground blob so the codec's <0.99 mask has support
    yy, xx = np.mgrid[0:S, 0:S]
    for b in range(B):
        cx, cy = rng.uniform(40, 88, 2)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 20.0 ** 2)))
        im[b, 0] -= 1.6 * blob
    return np.clip(im, -1.0, 1.0)


def _draws(rng):
    s = np.clip(rng.randn(N_AUG, B) * 0.25 + 1.0, 0.75, 1.25)
    rot = np.clip(rng.randn(N_AUG, B) * 30.0, -60.0, 60.0)
    s[0], rot[0] = 1.0, 0.0
    return s, rot


def test_score_map_tta_matches_reference(monkeypatch, stub, img):
    """consistency.py:72-113 prediction_check_pytorch vs
    ccssl.prediction_check (score maps inverse-warped and averaged,
    one decode at the end)."""
    ref = _load_ref("CCSSL/consistency.py", "ref_consistency")
    tmodel, jfwd = stub
    s_all, rot_all = _draws(np.random.RandomState(11))

    # the reference draws randn(B) twice per non-identity pass: s, rot
    q = []
    for i in range(1, N_AUG):
        q += [torch.tensor((s_all[i] - 1.0) / 0.25, dtype=torch.float32),
              torch.tensor(rot_all[i] / 30.0, dtype=torch.float32)]
    monkeypatch.setattr(torch, "randn", lambda *a, **k: q.pop(0))

    with torch.no_grad():
        ref_joints = ref.prediction_check_pytorch(
            torch.tensor(img), tmodel, num_transform=N_AUG,
            num_kpts=J).numpy()

    ours, conf = ccssl.prediction_check(
        jax.random.PRNGKey(0), jfwd, jnp.asarray(img), n_aug=N_AUG,
        draws=(jnp.asarray(s_all), jnp.asarray(rot_all)))
    np.testing.assert_allclose(np.asarray(ours), ref_joints,
                               rtol=1e-4, atol=1e-4)
    assert conf.shape == (B, J)
    assert np.isfinite(np.asarray(conf)).all()


def test_joint_tta_matches_reference(monkeypatch, stub, img):
    """consis.py:9-50 prediction_check vs ccssl.prediction_check_joints
    (per-pass decode, joints inverse-transformed in the 128-px frame and
    averaged; per-pass softmax-peak confidence)."""
    ref = _load_ref("CCSSL/consis.py", "ref_consis")
    tmodel, jfwd = stub
    s_all, rot_all = _draws(np.random.RandomState(13))

    ref_joints = np.zeros((B, J, 3), np.float32)
    ref_conf = np.zeros((B, J), np.float32)
    for b in range(B):
        # consis.py draws np.random.randn() scalars: s then rot per pass
        q = []
        for i in range(1, N_AUG):
            q += [(s_all[i, b] - 1.0) / 0.25, rot_all[i, b] / 30.0]
        monkeypatch.setattr(np.random, "randn", lambda *a: q.pop(0))
        with torch.no_grad():
            jt, cf = ref.prediction_check(
                torch.tensor(img[b]), tmodel, num_transform=N_AUG,
                num_kpts=J)
        ref_joints[b] = jt.numpy()[0]
        ref_conf[b] = cf.numpy()

    ours, conf = ccssl.prediction_check_joints(
        np.random.RandomState(0), jfwd, img, n_aug=N_AUG,
        draws=(s_all, rot_all))
    np.testing.assert_allclose(np.asarray(ours), ref_joints,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(conf), ref_conf,
                               rtol=1e-4, atol=1e-5)


def test_ref_crop_affine_matches_cv2_construction(monkeypatch):
    """ref_crop_affine == data/transform.py get_affine_transform (which
    solves the same 3 point pairs through cv2.getAffineTransform)."""
    tr = load_reference_module("data/transform.py", "ref_data_transform")
    rng = np.random.RandomState(3)
    for _ in range(10):
        s = float(rng.uniform(0.75, 1.25))
        rot = float(rng.uniform(-60, 60))
        ref_M = tr.get_affine_transform(np.array([64.0, 64.0]), s, rot,
                                        (128, 128))
        our_M = ccssl.ref_crop_affine((64.0, 64.0), s, rot, 128)
        np.testing.assert_allclose(our_M, ref_M, rtol=1e-6, atol=1e-6)
