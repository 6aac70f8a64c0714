"""Live-reference A/B of the MANO-fitting (IK) objective.

The reference's offline `opt_depth` tool (render_loader.py:3594-3653)
produced its posePara parameter banks by Adam-optimizing
(quat, theta, beta, cam) against world joints + a point-cloud term.
`fit_mano.fit_params_world` reimplements that objective; here the
ACTUAL reference loss (torch SmoothL1 + priors + min-squared pcl→vertex
distance, through the live MANO_SMPL) runs side by side with ours from
the same init — loss trajectories and fitted params must match.
"""

import numpy as np
import pytest
import torch

from dsf_tpu.mano import model as mano
from dsf_tpu.mano import synthetic
from dsf_tpu.tools.fit_mano import fit_params_world

from reference_import import load_reference_module


STEPS, LR, B = 6, 0.01, 2


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("mano_assets")
    pkl = synthetic.save_synthetic_mano_pkl(str(d / "MANO_RIGHT.pkl"))
    npz = synthetic.save_synthetic_mano(str(d / "mano.npz"))
    return pkl, npz


def _reference_fit(ref_layer, quat0, theta0, cam0, pcl, j3d):
    """The exact opt_depth inner loop (render_loader.py:3611-3648),
    minus the hard-coded data plumbing."""
    quat = torch.tensor(quat0, requires_grad=True)
    theta = torch.tensor(theta0, requires_grad=True)
    beta = torch.zeros(B, 10, requires_grad=True)
    cam = torch.tensor(cam0, requires_grad=True)
    pcl_t = torch.from_numpy(pcl)
    j3d_t = torch.from_numpy(j3d)
    L1 = torch.nn.SmoothL1Loss()
    opt = torch.optim.Adam([quat, theta, beta, cam], lr=LR)
    hist = []
    for _ in range(STEPS):
        opt.zero_grad()
        verts, joints = ref_layer.get_mano_vertices(quat, theta, beta, cam)
        pcl_offset = torch.min(
            torch.sum(torch.pow(pcl_t.unsqueeze(2) - verts.unsqueeze(1), 2),
                      dim=-1), dim=-1)[0]
        loss = (L1(joints, j3d_t) + torch.pow(beta, 2).mean()
                + torch.pow(theta, 2).mean() + pcl_offset.mean())
        loss.backward()
        opt.step()
        hist.append(float(loss))
    return {"quat": quat.detach().numpy(), "theta": theta.detach().numpy(),
            "beta": beta.detach().numpy(), "cam": cam.detach().numpy()}, hist


def test_fit_objective_matches_reference(assets):
    ref_mod = load_reference_module("render_model/mano_layer.py",
                                    "ref_mano_layer_fit")
    ref_layer = ref_mod.MANO_SMPL(assets[0], "nyu")
    m = mano.load_model(assets[1])

    rng = np.random.RandomState(3)
    quat0 = (rng.randn(B, 3) * 0.2).astype(np.float32)
    theta0 = (rng.randn(B, 45) * 0.2).astype(np.float32)
    cam0 = np.concatenate([np.ones((B, 1)), rng.randn(B, 3) * 20],
                          axis=1).astype(np.float32)
    # targets: a perturbed pose of the same model + a noisy vert cloud
    with torch.no_grad():
        vt, jt = ref_layer.get_mano_vertices(
            torch.from_numpy(quat0 + 0.1), torch.from_numpy(theta0 + 0.1),
            torch.zeros(B, 10), torch.from_numpy(cam0))
    j3d = jt.numpy().astype(np.float32)
    sel = rng.choice(vt.shape[1], 64, replace=False)
    pcl = (vt.numpy()[:, sel] + rng.randn(B, 64, 3).astype(np.float32))

    ref_p, ref_hist = _reference_fit(ref_mod.MANO_SMPL(assets[0], "nyu"),
                                     quat0, theta0, cam0, pcl, j3d)
    ours_p, ours_hist = fit_params_world(m, pcl, j3d, quat0, theta0, cam0,
                                         steps=STEPS, lr=LR)

    np.testing.assert_allclose(ours_hist, ref_hist, rtol=1e-3, atol=1e-3)
    for k in ("quat", "theta", "beta", "cam"):
        np.testing.assert_allclose(np.asarray(ours_p[k]), ref_p[k],
                                   rtol=1e-3, atol=2e-4, err_msg=k)
    # the fit is actually descending
    assert ours_hist[-1] < ours_hist[0]
