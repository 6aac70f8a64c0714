"""The native/vectorized eval-batch fast path must be interchangeable
with the per-item python path on every dataset that wires it (NYU is
covered by the e2e + misc-parity tests; these pin ICVL and MSRA).
"""

import numpy as np
import pytest

from dsf_tpu.data import datasets as D
from dsf_tpu.data import native

from test_datasets_protocol import (_write_icvl_png, _icvl_line,
                                    _write_msra_bin)


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def _assert_batches_match(ds, n):
    idx = np.arange(n)
    fast = ds._fetch_batch(idx)
    slow = D.BaseDataset._fetch_batch(ds, idx)
    assert set(fast) == set(slow)
    for k in slow:
        np.testing.assert_allclose(
            fast[k], slow[k], atol=2e-4, err_msg=k)


def test_icvl_fast_batch_matches_items(tmp_path):
    import os
    root = tmp_path / "icvl"
    names = [f"201403121135/image_{i:04d}.png" for i in range(1, 5)]
    (root / "Depth").mkdir(parents=True)
    for i, nm in enumerate(names):
        _write_icvl_png(str(root / "Depth" / nm), value=410 + 10 * i)
    (root / "test_seq_1.txt").write_text(
        "\n".join(_icvl_line(nm, base=400.0) for nm in names) + "\n")
    (root / "test_seq_2.txt").write_text("\n")
    centers = np.tile([10.0, 5.0, 400.0], (len(names), 1))
    np.savetxt(root / "center_test_refined.txt", centers, fmt="%.4f")

    ds = D.ICVLDataset(str(root), "test", img_size=64,
                       cube_size=(200, 200, 200))
    assert len(ds) == len(names)
    _assert_batches_match(ds, len(names))


def test_msra_fast_batch_matches_items(tmp_path):
    import os
    root = tmp_path / "msra"
    rng = np.random.RandomState(0)
    joints = rng.uniform(-40, 40, (2, 21, 3)).astype(np.float32)
    joints[:, :, 2] = -(400.0 + joints[:, :, 2])    # raw file stores -z
    for p, gesture in ((0, "1"), (0, "2")):
        gdir = root / f"P{p}" / gesture
        for i in range(2):
            _write_msra_bin(str(gdir / f"{i:06d}_depth.bin"), z=400.0 + i)
        lines = [" ".join(f"{v:.4f}" for v in joints[i].ravel())
                 for i in range(2)]
        (gdir / "joint.txt").write_text("2\n" + "\n".join(lines) + "\n")

    ds = D.MSRADataset(str(root), "test", test_persons=0, img_size=64)
    assert len(ds) == 4
    _assert_batches_match(ds, 4)


def test_subclasses_with_extra_keys_bypass_fast_path(tmp_path):
    """NYUCCSSLDataset adds 'weight' and NYUSTDataset adds 'model_para'
    via __getitem__; the inherited fast path must NOT swallow them on
    unaugmented fetches (regression: the fast path bypassed
    __getitem__)."""
    from dsf_tpu.data.fake import make_fake_nyu
    from dsf_tpu.mano import synthetic

    mano = synthetic.save_synthetic_mano(str(tmp_path / "m.npz"))
    make_fake_nyu(str(tmp_path / "data"), mano, n_train=4, n_test=2)
    root = str(tmp_path / "data" / "nyu")

    st = D.NYUSTDataset(root, "test", img_size=64)
    st.augment = False
    b = st._fetch_batch(np.arange(2))
    assert "model_para" in b and b["model_para"].shape == (2, 62)

    pseudo = tmp_path / "pseudo"
    pseudo.mkdir()
    n = len(D.NYUDataset(root, "test", img_size=64))
    uvd = np.tile([320.0, 240.0, 700.0], (n, 14, 1))
    np.savetxt(pseudo / "joint_uvd.txt", uvd.reshape(n, -1), fmt="%.3f")
    np.savetxt(pseudo / "weight.txt", np.ones((n, 14)), fmt="%.3f")
    cc = D.NYUCCSSLDataset(root, "test", str(pseudo), img_size=64)
    cc.augment = False
    b = cc._fetch_batch(np.arange(2))
    assert "weight" in b and b["weight"].shape == (2, 14)
