"""Structural test for the MANO_OCR_stage checkpoint converter: build a
synthetic state_dict with the reference's exact key names/shapes, convert,
and run the two-stage net — catches any tree-path or weight-layout drift.
(Numerical conv/deconv/BN layout parity is covered per-layer in
test_models.py / test_torch_import.py.)"""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from dsf_tpu.models.backbone import ManoOCRStage
from dsf_tpu.models import torch_import as TI


def _synthetic_state_dict(rng):
    """Key names follow the reference MANO_OCR_stage module tree
    (model/backbone.py:188-242): pre.{0,1}, layer{1-4}[_s2].{0,1}.*,
    mano_regress[_s2].2, deconv_layer{4,3,2}[_s2].{0,1},
    finals[_s2].{0,1}, fusion.{0,1}."""
    sd = {}

    def conv(name, out_c, in_c, k):
        sd[f"{name}.weight"] = rng.randn(out_c, in_c, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    def basic_block(prefix, in_c, out_c, stride):
        conv(f"{prefix}.conv1", out_c, in_c, 3)
        bn(f"{prefix}.bn1", out_c)
        conv(f"{prefix}.conv2", out_c, out_c, 3)
        bn(f"{prefix}.bn2", out_c)
        if stride != 1 or in_c != out_c:
            conv(f"{prefix}.downsample.0", out_c, in_c, 1)
            bn(f"{prefix}.downsample.1", out_c)

    def res_layers(suffix, in0):
        chans = [(64, 1), (128, 2), (256, 2), (512, 2)]
        in_c = in0
        for li, (c, s) in enumerate(chans, start=1):
            basic_block(f"layer{li}{suffix}.0", in_c, c, s)
            basic_block(f"layer{li}{suffix}.1", c, c, 1)
            in_c = c

    def heads(suffix):
        sd[f"mano_regress{suffix}.2.weight"] = rng.randn(62, 512).astype(np.float32) * 0.01
        sd[f"mano_regress{suffix}.2.bias"] = np.zeros(62, np.float32)
        ins = 512
        for li in (4, 3, 2):
            sd[f"deconv_layer{li}{suffix}.0.weight"] = \
                rng.randn(ins, 256, 4, 4).astype(np.float32) * 0.01
            bn(f"deconv_layer{li}{suffix}.1", 256)
            ins = 256
        conv(f"finals{suffix}.0", 63, 256, 1)
        sd[f"finals{suffix}.0.bias"] = np.zeros(63, np.float32)
        conv(f"finals{suffix}.1", 21, 256, 1)
        sd[f"finals{suffix}.1.bias"] = np.zeros(21, np.float32)

    conv("pre.0", 64, 1, 5)
    bn("pre.1", 64)
    res_layers("", 64)
    heads("")
    conv("fusion.0", 256, 64 + 256 + 84 + 84, 3)
    bn("fusion.1", 256)
    res_layers("_s2", 256)
    heads("_s2")
    return sd


def _make_renderer():
    from dsf_tpu.mano import model as mano_model, synthetic
    from dsf_tpu.render import Renderer
    path = os.path.join(tempfile.gettempdir(), "syn_mano_imp_test.npz")
    if not os.path.exists(path):
        synthetic.save_synthetic_mano(path)
    m = mano_model.load_model(path)
    return Renderer.create(m, "nyu", (588.03, 587.07, 320.0, 240.0),
                           (640, 480), (64, 64))


def test_convert_and_apply():
    rng = np.random.RandomState(0)
    sd = _synthetic_state_dict(rng)
    variables = TI.convert_mano_ocr_stage(sd, refine=True)

    r = _make_renderer()
    net = ManoOCRStage(joint_num=21, refine=True)
    img = jnp.zeros((2, 1, 64, 64))
    center = jnp.asarray([[0.0, 0.0, 750.0]] * 2)
    cube = jnp.full((2, 3), 250.0)

    # converted tree must exactly match the initialized tree's structure
    ref_vars = net.init(jax.random.PRNGKey(0), img, r, center, cube,
                        train=False)
    ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(ref_vars["params"])}
    got_paths = {jax.tree_util.keystr(k): np.shape(v) for k, v in
                 jax.tree_util.tree_leaves_with_path(variables["params"])}
    missing = set(ref_paths) - set(got_paths)
    extra = set(got_paths) - set(ref_paths)
    assert not missing, f"converter missing params: {sorted(missing)[:8]}"
    assert not extra, f"converter extra params: {sorted(extra)[:8]}"
    for k in ref_paths:
        assert ref_paths[k] == got_paths[k], (k, ref_paths[k], got_paths[k])

    out = net.apply(variables, img, r, center, cube, train=False)
    assert len(out) == 2
    assert out[0][0].shape == (2, 84, 32, 32)
    assert out[1][1].shape == (2, 62)
    assert np.isfinite(np.asarray(out[1][0])).all()
