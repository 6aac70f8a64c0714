"""Tests for the synth-sample factory and crop renderer."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu import geometry as geo
from dsf_tpu.mano import model as mano_model, synthetic
from dsf_tpu.render import renderer as rnd

PARAS = (588.03, 587.07, 320.0, 240.0)


@pytest.fixture(scope="module")
def renderer():
    path = os.path.join(tempfile.gettempdir(), "syn_mano_render_test.npz")
    if not os.path.exists(path):
        synthetic.save_synthetic_mano(path)
    m = mano_model.load_model(path)
    return rnd.Renderer.create(m, "nyu", PARAS, (640, 480))


def _params(B, seed=0):
    rng = np.random.RandomState(seed)
    para = np.concatenate([
        rng.uniform(-1, 1, (B, 3)), rng.randn(B, 45) * 0.3,
        rng.randn(B, 10) * 0.5, np.ones((B, 1)),
        np.zeros((B, 3))], axis=1).astype(np.float32)
    return jnp.asarray(para)


def test_synth_sample_shapes_and_ranges(renderer):
    B = 4
    key = jax.random.PRNGKey(0)
    cube = jnp.full((B, 3), 250.0)
    img, juvd, vuvd, jxyz, vxyz, center, cube_o, M = rnd.synth_sample(
        renderer, key, _params(B), cube, mask=False)
    assert img.shape == (B, 1, 128, 128)
    assert juvd.shape == (B, 21, 3) and vuvd.shape == (B, 779, 3)
    assert jxyz.shape == (B, 21, 3) and vxyz.shape == (B, 779, 3)
    arr = np.asarray(img)
    assert arr.min() >= -1.0 - 1e-5 and arr.max() <= 1.0 + 1e-5
    # hand visible: some foreground pixels
    assert (arr < 0.99).mean() > 0.01
    # depth placed inside the dataset range
    z = np.asarray(center)[:, 2]
    assert (z >= 500).all() and (z <= 1200).all()


def test_labels_consistent_with_geometry(renderer):
    """joint_uvd must equal xyz_nl -> uvd_nl through the returned M."""
    B = 3
    key = jax.random.PRNGKey(1)
    cube = jnp.full((B, 3), 250.0)
    img, juvd, _, jxyz, _, center, cube_o, M = rnd.synth_sample(
        renderer, key, _params(B, 7), cube, mask=False)
    uvd2 = geo.xyz_nl_to_uvd_nl(jxyz, center, M, cube_o, PARAS, 128)
    np.testing.assert_allclose(np.asarray(juvd), np.asarray(uvd2),
                               rtol=1e-3, atol=2e-3)


def test_image_label_alignment(renderer):
    """Rendered foreground should appear near projected joint pixels."""
    B = 2
    key = jax.random.PRNGKey(2)
    cube = jnp.full((B, 3), 250.0)
    img, juvd, _, _, _, _, _, _ = rnd.synth_sample(
        renderer, key, _params(B, 3), cube, mask=False)
    arr = np.asarray(img)[:, 0]
    uv = (np.asarray(juvd)[:, :, :2] + 1) / 2 * 128
    for b in range(B):
        hits = 0
        for j in range(21):
            u, v = int(np.clip(uv[b, j, 0], 2, 125)), int(np.clip(uv[b, j, 1], 2, 125))
            if (arr[b, v - 2:v + 3, u - 2:u + 3] < 0.99).any():
                hits += 1
        assert hits >= 12, f"only {hits}/21 joints on foreground"


def test_mask_img_occludes(renderer):
    B = 2
    img = jnp.full((B, 1, 128, 128), -0.2)
    joints = jnp.zeros((B, 21, 3)).at[..., 2].set(-0.2)
    out = rnd.mask_img(jax.random.PRNGKey(0), img, joints, 0.15, 0.3)
    arr = np.asarray(out)
    assert (arr == 1.0).any()            # some occluded pixels
    assert (arr == -0.2).any()           # not everything occluded


def test_render_params_roundtrip(renderer):
    """Rendering params whose cam plants the hand at the crop center
    produces a centered, normalized image."""
    B = 2
    para = _params(B, 11)
    center = jnp.asarray([[0.0, 0.0, 750.0]] * B)
    cube = jnp.full((B, 3), 250.0)
    img, juvd, jxyz, mxyz = rnd.render_params(renderer, para, center, cube)
    assert img.shape == (B, 1, 128, 128)
    assert juvd.shape == (B, 21, 3)
    assert mxyz.shape == (B, 779, 3)
    assert (np.asarray(img) < 0.99).mean() > 0.005


def test_synth2real_and_patch_gaussian(renderer):
    img = jnp.full((1, 1, 128, 128), 0.5)
    out = rnd.synth2real(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape
    out2 = rnd.patch_gaussian(jax.random.PRNGKey(1), img)
    assert out2.shape == img.shape
    assert not np.allclose(np.asarray(out2), np.asarray(img))
