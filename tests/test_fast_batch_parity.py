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
