"""Numerical parity of torch->flax checkpoint conversion.

Builds a torch module with the pix2pix ResnetGenerator's exact
Sequential layout/key names (the format of `latest_net_G_A.pth`), runs
random weights through the converter, and compares outputs elementwise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from dsf_tpu.models.cyclegan import ResnetGenerator  # noqa: E402
from dsf_tpu.models import torch_import as TI  # noqa: E402


def build_torch_g(n_blocks=2, ngf=8):
    """pix2pix generator layout with instance norm (matches the
    state_dict key structure of the reference's transfer net)."""
    IN = lambda ch: tnn.InstanceNorm2d(ch, affine=False,
                                       track_running_stats=False)

    class Block(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv_block = tnn.Sequential(
                tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3), IN(dim),
                tnn.ReLU(True), tnn.ReflectionPad2d(1),
                tnn.Conv2d(dim, dim, 3), IN(dim))

        def forward(self, x):
            return x + self.conv_block(x)

    layers = [tnn.ReflectionPad2d(3), tnn.Conv2d(1, ngf, 7), IN(ngf),
              tnn.ReLU(True)]
    for i in range(2):
        m = 2 ** i
        layers += [tnn.Conv2d(ngf * m, ngf * m * 2, 3, 2, 1),
                   IN(ngf * m * 2), tnn.ReLU(True)]
    for i in range(n_blocks):
        layers += [Block(ngf * 4)]
    for i in range(2):
        m = 2 ** (2 - i)
        layers += [tnn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, 2, 1,
                                       output_padding=1),
                   IN(ngf * m // 2), tnn.ReLU(True)]
    layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 1, 7), tnn.Tanh()]

    class G(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = tnn.Sequential(*layers)

        def forward(self, x):
            return self.model(x)

    return G()


def test_cyclegan_conversion_matches_torch():
    torch.manual_seed(0)
    g = build_torch_g(n_blocks=2, ngf=8)
    g.eval()
    x = np.random.RandomState(0).randn(1, 1, 64, 64).astype(np.float32)
    with torch.no_grad():
        expected = g(torch.from_numpy(x)).numpy()

    sd = {k: v for k, v in g.state_dict().items()}
    variables = TI.convert_cyclegan_generator(sd, n_blocks=2)
    net = ResnetGenerator(input_nc=1, output_nc=1, ngf=8, n_blocks=2)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_cyclegan_matches_live_reference_define_G():
    """The reference's ACTUAL transfer net — define_G(1, 1, 64,
    'resnet_9blocks', 'instance', False, 'xavier'), the exact production
    construction of train_render.py:95 — converted and compared output-
    to-output at the training resolution."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from reference_import import load_reference_module

    tr = load_reference_module("render_model/transfer.py", "ref_transfer")
    torch.manual_seed(1)
    g = tr.define_G(1, 1, 64, "resnet_9blocks", "instance", False, "xavier")
    g.eval()
    x = np.random.RandomState(1).randn(1, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        expected = g(torch.from_numpy(x)).numpy()

    variables = TI.convert_cyclegan_generator(dict(g.state_dict()),
                                              n_blocks=9)
    net = ResnetGenerator(input_nc=1, output_nc=1, ngf=64, n_blocks=9)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)
