"""Direct unit tests of phase-internal semantics: M2P gating, masked
SmoothL1 selection, m2d variants."""

import numpy as np
import jax.numpy as jnp

from dsf_tpu.training import phases as P


def test_m2p_mask_gating():
    B, S = 2, 16
    crop = jnp.ones((B, 1, S, S))
    mano = jnp.ones((B, 1, S, S))
    # sample 0: perfect overlap at matching depth -> gate open
    crop = crop.at[0, 0, 4:12, 4:12].set(0.2)
    mano = mano.at[0, 0, 4:12, 4:12].set(0.2)
    # sample 1: large depth mismatch -> depth gate closed
    crop = crop.at[1, 0, 4:12, 4:12].set(0.2)
    mano = mano.at[1, 0, 4:12, 4:12].set(0.9)
    d2m = jnp.asarray([1e-5, 1e-5])            # icp gate open for both
    pd2m = jnp.full((B, 15), 1e-5)             # all parts pass
    mask = P._m2p_mask(crop, mano, d2m, pd2m)
    m = np.asarray(mask)
    assert m.shape == (B, 21)
    assert m[0].all()                          # open
    assert not m[1].any()                      # closed by depth gate

    # icp gate: same images, but d2m above 1e-3 closes it
    mask2 = P._m2p_mask(crop, mano, jnp.asarray([1.0, 1.0]), pd2m)
    assert not np.asarray(mask2).any()

    # per-joint gate: part 3 fails -> joints 4 (=1+3) and its fingertip
    # copy (joint_add index) close, wrist stays open
    pd2m3 = pd2m.at[0, 3].set(1.0)
    mask3 = np.asarray(P._m2p_mask(crop, mano, d2m, pd2m3))
    assert mask3[0, 0]                          # wrist always allowed
    assert not mask3[0, 4]                      # 1 + part index 3
    assert mask3[0, 5]


def test_m2p_mask_empty_overlap_one_stage_nan_behavior():
    B, S = 1, 8
    crop = jnp.ones((B, 1, S, S))              # all background
    mano = jnp.ones((B, 1, S, S))
    d2m = jnp.asarray([1e-5])
    pd2m = jnp.full((B, 15), 1e-5)
    # 1-stage: empty both-mask -> nan in the reference -> gate CLOSED
    m1 = P._m2p_mask(crop, mano, d2m, pd2m, thresh=0.95,
                     union_denominator=False)
    assert not np.asarray(m1).any()
    # 2-stage: eps denominator -> 0 < 0.04 -> gate OPEN
    m2 = P._m2p_mask(crop, mano, d2m, pd2m)
    assert np.asarray(m2).all()


def test_masked_select_sl1():
    a = jnp.zeros((1, 3, 3))
    b = jnp.ones((1, 3, 3)) * 0.02
    mask = jnp.asarray([[True, False, True]])
    # per-joint elementwise smoothl1 of |z|=0.02: 0.01*(0.02-0.005)=1.5e-4
    val = float(P._masked_select_sl1(a, b, mask))
    np.testing.assert_allclose(val, 0.01 * 0.015, rtol=1e-5)
    # empty mask -> exactly 0 (ref: M2P_loss = 0 when no joints pass)
    assert float(P._masked_select_sl1(a, b, jnp.zeros((1, 3), bool))) == 0.0


def test_m2d_variants():
    B, S = 1, 8
    crop = jnp.ones((B, 1, S, S)).at[0, 0, :4].set(0.2)
    mano = jnp.ones((B, 1, S, S)).at[0, 0, :4].set(0.4)
    masked = float(P._m2d(crop, mano, masked_numerator=True).mean())
    unmasked = float(P._m2d(crop, mano, masked_numerator=False).mean())
    # identical here because background diffs are exactly zero
    np.testing.assert_allclose(masked, 0.2, atol=1e-6)
    np.testing.assert_allclose(unmasked, 0.2, atol=1e-6)
    # make the backgrounds differ slightly: only the unmasked numerator sees it
    mano2 = mano.at[0, 0, 6, 6].set(0.995)     # still "background" >= 0.99
    m2 = float(P._m2d(crop, mano2, masked_numerator=True).mean())
    u2 = float(P._m2d(crop, mano2, masked_numerator=False).mean())
    assert abs(m2 - 0.2) < 1e-6
    assert u2 > m2
