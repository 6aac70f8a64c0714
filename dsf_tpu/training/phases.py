"""Training phases as pure loss functions over a shared step skeleton.

Functional rewrites of the reference trainer's three per-iteration phase
methods (train_render.py:415-823):

* ``pretrain_loss``      — synth-only supervised losses (ref :415-488)
* ``finetune_loss``      — 1-stage synth + real self-supervision (:490-619)
* ``finetune_stage_loss``— 2-stage with stage-2-as-teacher (:622-823)

Everything runs inside one jit: synth-sample factory, transfer net,
dual-branch net, rendering of predictions, point-cloud machinery, all
loss terms.  The only inputs are fixed-shape device arrays + a PRNG key.
Each returns (loss, (mutated_model_state, metrics_dict)).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from dsf_tpu import geometry as geo
from dsf_tpu.losses.basic import smooth_l1
from dsf_tpu.losses.icp import icp_and_joint_icp
from dsf_tpu.mano import spheres as sph
from dsf_tpu.ops import cloud
from dsf_tpu.ops.offset_codec import joint2offset, offset2joint_softmax
from dsf_tpu.render import renderer as rnd


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def xyz2error_mm(pd_nl, gt_nl, center, cube, keep_batch=False,
                 keep_joint=False, dataset=None):
    """Mean 3D error in mm between normalized predictions and GT
    (ref: Trainer.xyz2error, train_render.py:826-864, jnp version).

    Dataset semantics preserved from the reference: ICVL subtracts a
    per-joint z bias from the prediction (ref :841-843; its (1,16) bias
    only broadcasts when J==16 — we take bias[:J] so the sliced 15-joint
    eval path also works); MSRA's scalar mean skips the wrist joint
    (ref :852-854)."""
    pd = pd_nl * cube[:, None] / 2.0 + center[:, None]
    gt = gt_nl * cube[:, None] / 2.0 + center[:, None]
    if dataset == "icvl":
        from dsf_tpu.mano.constants import ICVL_Z_BIAS
        J = pd.shape[1]
        bias = jnp.zeros((J,), pd.dtype).at[: min(J, 16)].set(
            jnp.asarray(ICVL_Z_BIAS, pd.dtype)[: min(J, 16)])
        pd = pd.at[:, :, 2].add(-bias[None, :])
    err = jnp.sqrt(jnp.sum((pd - gt) ** 2, axis=-1) + 1e-12)
    if keep_joint:
        return err
    if keep_batch:
        return err.mean(-1)
    if dataset == "msra":
        return err[:, 1:].mean()
    return err.mean()


def _aug_keys(key, batch):
    """The reference's synth augmentation draws (train_render.py:628-631)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    shape = jax.random.normal(k1, (batch, 10)) * 3.0
    center = (jax.random.uniform(k2, (batch, 3)) - 0.5) * 40.0
    size = 1.0 + (jax.random.uniform(k3, (batch, 1)) - 0.5) * 0.4
    view = jax.random.uniform(k4, (batch, 3)) * jnp.pi * 2.0
    return shape, center, size, view, k5, k6


def _masked_select_sl1(a, b, mask_joint):
    """SmoothL1 over only the masked joints, fixed shape (replaces the
    reference's index_select gather, train_render.py:795-801).
    a, b: (B, J, 3); mask_joint: (B, J) bool.  Returns 0 if empty."""
    z = (a - b).astype(jnp.float32)
    az = jnp.abs(z)
    val = jnp.where(az < 0.01, 0.5 * z * z, 0.01 * (az - 0.005))
    per_joint = val.mean(-1)                   # mean over xyz (ref last dim)
    n = mask_joint.sum()
    return jnp.where(n == 0, 0.0,
                     (per_joint * mask_joint).sum() / jnp.maximum(n, 1))


# ---------------------------------------------------------------------------
# phase: Pretrain (ref train_render.py:415-488)
# ---------------------------------------------------------------------------

def pretrain_loss(apply_fn, variables, key, model_para, cube, *,
                  r: rnd.Renderer, transfer_fn: Optional[Callable],
                  cfg, stage_num: int, train: bool = True):
    B = model_para.shape[0]
    aug_shape, aug_center, aug_size, _, k_synth, k_net = _aug_keys(key, B)
    aug_view = jnp.zeros((B, 3))    # view aug x0 during pretrain (ref :424)

    img, juvd_gt, vuvd_gt, jxyz_gt, vxyz_gt, center, cube_s, M = rnd.synth_sample(
        r, k_synth, model_para, cube, augment_view=aug_view,
        augment_shape=aug_shape, augment_center=aug_center,
        augment_size=aug_size, mask=cfg.mask)

    img_t = transfer_fn(img) if transfer_fn is not None else img
    outputs, new_state = _apply(apply_fn, variables, img_t, r, center, cube_s,
                                train)

    loss = 0.0
    metrics = {}
    for idx in range(stage_num):
        pixel_pd, para_pd = outputs[idx]
        fs = pixel_pd.shape[-1]
        pixel_gt = joint2offset(juvd_gt, img, cfg.feature_para[0], fs)
        juvd_pd = offset2joint_softmax(pixel_pd, img, cfg.feature_para[0])
        jxyz_pd = geo.uvd_nl_to_xyz_nl(juvd_pd, center, M, cube_s, r.paras,
                                       cfg.input_size, r.flip)
        loss += smooth_l1(pixel_pd, pixel_gt) * cfg.deconv_weight
        loss += smooth_l1(juvd_pd, juvd_gt) * cfg.coord_weight

        mano_jxyz, mano_mesh = rnd.get_mesh_xyz(r, para_pd)
        joint_loss = smooth_l1(mano_jxyz, jxyz_gt) * cfg.coord_weight
        verts_loss = smooth_l1(mano_mesh, vxyz_gt) * cfg.coord_weight
        beta_loss = jnp.mean(para_pd[:, 48:58] ** 2) * cfg.coord_weight * 10.0
        scale_loss = jnp.mean(jnp.abs(jnp.minimum(para_pd[:, 58], 0.0))) * 0.1
        loss += beta_loss + verts_loss + joint_loss + scale_loss

        metrics[f"pixel_error_{idx}"] = xyz2error_mm(jxyz_pd, jxyz_gt, center, cube_s)
        metrics[f"mano_error_{idx}"] = xyz2error_mm(mano_jxyz, jxyz_gt, center, cube_s)
        metrics[f"scale_loss_{idx}"] = scale_loss
    return loss, (new_state, metrics)


def _apply(apply_fn, variables, img, r, center, cube, train):
    if train:
        out, mut = apply_fn(variables, img, r, center, cube, train=True,
                            mutable=["batch_stats"])
    else:
        out = apply_fn(variables, img, r, center, cube, train=False)
        mut = {}
    # losses always run in f32 regardless of the net's compute dtype
    out = [[o[0].astype(jnp.float32), o[1].astype(jnp.float32)] for o in out]
    return out, mut


# ---------------------------------------------------------------------------
# shared real-image preprocessing (ref train_render.py:692-703)
# ---------------------------------------------------------------------------

def _prep_real(r, cfg, key, img_r, center_r, M_r, cube_r,
               joints_xyz_t, mano_joints_t, mano_mesh_t):
    """crop_hand + pixel segmentation + fixed-N clouds from the teacher.

    The two cloud extractions (joint-masked image + plain crop) run as
    ONE img_to_pcl call at 2B — identical semantics, the random
    subsampling just draws from one stream instead of two."""
    B = img_r.shape[0]
    S = cfg.input_size

    def two(x):
        return jnp.concatenate([x, x], axis=0)

    crop_img = cloud.crop_hand(img_r, mano_joints_t, center_r, M_r, cube_r,
                               r.paras, S, flip=r.flip)
    _, pcl_img = cloud.uvd_img_to_xyz_img(crop_img, center_r, M_r, cube_r,
                                          r.paras, S, r.flip)
    pcl_img = pcl_img.reshape(B, 3, -1).transpose(0, 2, 1)
    seg_img = sph.seg_pcl(r.mano, joints_xyz_t, mano_joints_t, mano_mesh_t,
                          pcl_img)
    seg_img = jnp.where(
        (crop_img < 0.99).reshape(B, -1), seg_img, 0).reshape(B, 1, S, S)
    joint_img = jnp.where(seg_img > 0, crop_img, jnp.ones_like(crop_img))
    both = cloud.img_to_pcl(key, jnp.concatenate([joint_img, crop_img]),
                            two(center_r), two(M_r), two(cube_r),
                            r.paras, S, 2048, S, r.flip)
    joint_pcl, pcl = both[:B], both[B:]
    seg = sph.seg_pcl(r.mano, joints_xyz_t, mano_joints_t, mano_mesh_t,
                      joint_pcl)
    return crop_img, seg_img, joint_pcl, seg, pcl


def _m2d(crop_img, mano_img_crop, masked_numerator=True):
    """Masked depth difference.

    FinetuneStage masks the numerator (ref :730-731); the 1-stage
    Finetune divides the UNMASKED mean |diff| by the mask mean
    (ref :557) — numerically near-identical (backgrounds are both
    exactly +1) but preserved faithfully.
    """
    mask = ((crop_img < 0.99) | (mano_img_crop < 0.99)).astype(crop_img.dtype)
    diff = jnp.abs(crop_img - mano_img_crop)
    if masked_numerator:
        diff = diff * mask
    return diff.sum((-1, -2)) / (mask.sum((-1, -2)) + 1e-8)   # (B, 1)


def _m2p_mask(crop_img, mano_img_crop, d2m_batch, pd2m_joint,
              thresh=0.99, union_denominator=True):
    """The M2P gating logic: per-sample depth & icp gates AND per-joint
    part gates expanded to 21 joints.  FinetuneStage gates at 0.99 with
    the union-mask denominator (ref :785-795); the 1-stage Finetune at
    0.95 with the both-mask denominator (ref :586-589)."""
    B = crop_img.shape[0]
    both = ((crop_img < thresh) & (mano_img_crop < thresh)).astype(crop_img.dtype)
    union = ((crop_img < thresh) | (mano_img_crop < thresh)).astype(crop_img.dtype)
    num = (jnp.abs(crop_img - mano_img_crop) * both).sum((-1, -2))
    denom = union if union_denominator else both
    denom_sum = denom.sum((-1, -2))
    depth_val = num / (denom_sum + 1e-8)
    depth_mask = depth_val < 0.04
    if not union_denominator:
        # the 1-stage reference divides WITHOUT eps (ref :588): an empty
        # mask yields nan which fails the lt(0.04) gate — keep that
        depth_mask = depth_mask & (denom_sum > 0)
    depth_mask = depth_mask.squeeze(-1)
    icp_mask = d2m_batch < 1e-3
    mano_mask = depth_mask & icp_mask                     # (B,)
    joint_mask = pd2m_joint < 1e-3                        # (B, 15)
    joint_add = jnp.asarray([2, 5, 8, 11, 14])
    joint_mask = jnp.concatenate(
        [jnp.ones((B, 1), bool), joint_mask, joint_mask[:, joint_add]], axis=-1)
    return mano_mask[:, None] & joint_mask                # (B, 21)


def _transfer_slice(x, transfer):
    return x[:, jnp.asarray(transfer), :]


# ---------------------------------------------------------------------------
# phase: Finetune, 1-stage (ref train_render.py:490-619)
# ---------------------------------------------------------------------------

def finetune_loss(apply_fn, variables, key, model_para, cube,
                  img_r, center_r, cube_r, M_r, xyz_gt_r, *,
                  r: rnd.Renderer, transfer_fn, cfg, transfer_map,
                  train: bool = True, apply2_fn=None):
    """1-stage phase.  The reference runs the net TWICE sequentially
    (synth :506-509, real :517); here both batches run as ONE stacked
    2B forward with per-group BN statistics (layers.BatchNorm groups=2)
    — identical numerics (stats per half, EMA composed in call order),
    double the conv batch for the MXU."""
    B = model_para.shape[0]
    k_aug, k_prep, k_net = jax.random.split(key, 3)
    aug_shape, aug_center, aug_size, aug_view, k_synth, _ = _aug_keys(k_aug, B)

    # ---- synth branch
    img, juvd_gt, vuvd_gt, jxyz_gt, vxyz_gt, center_s, cube_s, M_s = \
        rnd.synth_sample(r, k_synth, model_para, cube,
                         augment_view=aug_view, augment_shape=aug_shape,
                         augment_center=aug_center, augment_size=aug_size,
                         mask=cfg.mask)
    img_t = transfer_fn(img) if transfer_fn is not None else img

    stacked = jnp.concatenate([img_t.astype(jnp.float32), img_r], axis=0)
    out_2b, state1 = _apply(apply2_fn or apply_fn, variables, stacked, r,
                            jnp.concatenate([center_s, center_r], axis=0),
                            jnp.concatenate([cube_s, cube_r], axis=0), train)
    outputs = [[o[0][:B], o[1][:B]] for o in out_2b]
    outputs_r = [[o[0][B:], o[1][B:]] for o in out_2b]
    pixel_pd, para_pd = outputs[0]
    fs = pixel_pd.shape[-1]
    pixel_gt = joint2offset(juvd_gt, img, cfg.feature_para[0], fs)
    juvd_pd = offset2joint_softmax(pixel_pd, img, cfg.feature_para[0])
    loss = smooth_l1(pixel_pd[:, :pixel_gt.shape[1]], pixel_gt) * cfg.deconv_weight
    loss += smooth_l1(juvd_pd, juvd_gt) * cfg.coord_weight

    mano_jxyz_s, mesh_s = rnd.get_mesh_xyz(r, para_pd)
    loss += smooth_l1(mano_jxyz_s, jxyz_gt) * cfg.coord_weight
    loss += smooth_l1(mesh_s, vxyz_gt) * cfg.coord_weight
    loss += sph.collision_loss(r.mano, mano_jxyz_s,
                               jax.lax.stop_gradient(mesh_s)) * cfg.coll_weight

    # ---- real branch (from the stacked forward's second half)
    state2 = state1
    pixel_r, para_r = outputs_r[0]
    juvd_r = offset2joint_softmax(pixel_r, img_r, cfg.feature_para[0])
    jxyz_r = geo.uvd_nl_to_xyz_nl(juvd_r, center_r, M_r, cube_r, r.paras,
                                  cfg.input_size, r.flip)

    mano_img_r, mano_juvd_r, mano_jxyz_r, mesh_r = rnd.render_params(
        r, para_r, center_r, cube_r)
    coll = sph.collision_loss(r.mano, mano_jxyz_r,
                              jax.lax.stop_gradient(mesh_r))

    crop_img, seg_img, joint_pcl, seg, pcl = _prep_real(
        r, cfg, k_prep, img_r, center_r, M_r, cube_r,
        jax.lax.stop_gradient(jxyz_r), jax.lax.stop_gradient(mano_jxyz_r),
        jax.lax.stop_gradient(mesh_r))
    # 1-stage variant crops the rendered image with its own joints (ref :555)
    mano_img_crop = cloud.crop_hand(mano_img_r,
                                    jax.lax.stop_gradient(mano_jxyz_r),
                                    center_r, M_r, cube_r, r.paras,
                                    cfg.input_size, flip=r.flip)

    m2d_b = _m2d(crop_img, mano_img_crop, masked_numerator=False)
    m2d = m2d_b.mean()
    d2m_b, pd2m_joint = icp_and_joint_icp(mesh_r, pcl, joint_pcl,
                                          r.mano.faces,
                                          r.mano.joint_face_mask, seg)
    pd2m = pd2m_joint.mean()
    d2m = d2m_b.mean()

    p2m = smooth_l1(mano_juvd_r, jax.lax.stop_gradient(juvd_r)) * cfg.coord_weight
    m2p_mask = _m2p_mask(crop_img, mano_img_r, d2m_b, pd2m_joint,
                         thresh=0.95, union_denominator=False)
    m2p = _masked_select_sl1(juvd_r, jax.lax.stop_gradient(mano_juvd_r),
                             jax.lax.stop_gradient(m2p_mask)) * cfg.coord_weight

    loss += p2m
    loss += m2d * 0.1 * cfg.model_weight
    loss += d2m * cfg.model_weight
    loss += pd2m * cfg.partICP_weight
    loss += m2p * cfg.M2P_weight
    loss += coll * cfg.coll_weight

    nt = len(transfer_map)
    err_pix = xyz2error_mm(_transfer_slice(jxyz_r, transfer_map)[:, :nt],
                           xyz_gt_r[:, :nt], center_r, cube_r,
                           dataset=cfg.dataset)
    err_mano = xyz2error_mm(_transfer_slice(mano_jxyz_r, transfer_map)[:, :nt],
                            xyz_gt_r[:, :nt], center_r, cube_r,
                            dataset=cfg.dataset)
    metrics = {"pixel_error": err_pix, "mano_error": err_mano,
               "m2d": m2d, "pd2m": pd2m, "P2M": p2m, "coll": coll,
               "M2P": m2p, "d2m": d2m}
    return loss, (state2, metrics)




# ---------------------------------------------------------------------------
# phase: FinetuneStage, 2-stage with stage-2 teacher (ref :622-823)
# ---------------------------------------------------------------------------

def finetune_stage_loss(apply_fn, variables, key, model_para, cube,
                        img_r, center_r, cube_r, M_r, xyz_gt_r, *,
                        r: rnd.Renderer, transfer_fn, cfg, transfer_map,
                        train: bool = True, apply2_fn=None):
    """Two-stage phase with stage-2 as teacher (ref :622-823).

    TPU restructure (both preserve the reference's numerics exactly):
    1. the reference's two SEQUENTIAL net calls (synth :640, real :671)
       run as ONE stacked [synth | real] 2B forward with per-group BN
       statistics (layers.BatchNorm groups=2: stats per half, running
       EMA composed in call order) — doubles the conv batch on the MXU
       and folds the two internal stage-2 input renders into one raster
       call;
    2. the two stages' loss tensors are STACKED stage-major along
       batch, so every per-stage loss op (codec decode, MANO LBS,
       collision, crop_hand, m2d, the ICP family) runs ONCE at 2B —
       each scalar is reduced from its stage's slice exactly as before,
       and the fused icp_and_joint_icp does one nearest-face pass for
       all four (stage x cloud) combinations."""
    B = model_para.shape[0]
    k_aug, k_prep, _ = jax.random.split(key, 3)
    aug_shape, aug_center, aug_size, aug_view, k_synth, _ = _aug_keys(k_aug, B)

    def two(x):
        return jnp.concatenate([x, x], axis=0)

    # ---------------- synth: full supervision on both stages (ref :633-667)
    img, juvd_gt, vuvd_gt, jxyz_gt, vxyz_gt, center_s, cube_s, M_s = \
        rnd.synth_sample(r, k_synth, model_para, cube,
                         augment_view=aug_view, augment_shape=aug_shape,
                         augment_center=aug_center, augment_size=aug_size,
                         mask=cfg.mask)
    img_t = transfer_fn(img) if transfer_fn is not None else img

    stacked = jnp.concatenate([img_t.astype(jnp.float32), img_r], axis=0)
    out_2b, state1 = _apply(
        apply2_fn or apply_fn, variables, stacked, r,
        jnp.concatenate([center_s, center_r], axis=0),
        jnp.concatenate([cube_s, cube_r], axis=0), train)
    outputs = [[o[0][:B], o[1][:B]] for o in out_2b]
    outputs_r = [[o[0][B:], o[1][B:]] for o in out_2b]
    loss = 0.0
    metrics = {}
    pixel_s = jnp.concatenate([outputs[0][0], outputs[1][0]], axis=0)
    para_s = jnp.concatenate([outputs[0][1], outputs[1][1]], axis=0)
    fs = pixel_s.shape[-1]
    # the reference recomputes the identical pixel_gt per stage (:646)
    pixel_gt = joint2offset(juvd_gt, img, cfg.feature_para[0], fs)
    juvd_pd_s = offset2joint_softmax(pixel_s, two(img), cfg.feature_para[0])
    mano_jxyz_s, mesh_s = rnd.get_mesh_xyz(r, para_s)   # one LBS, both stages
    coll_s = sph.collision_loss(r.mano, mano_jxyz_s,
                                jax.lax.stop_gradient(mesh_s),
                                keep_batch=True)
    for idx in range(2):
        sl = slice(idx * B, (idx + 1) * B)
        loss += smooth_l1(pixel_s[sl], pixel_gt) * cfg.deconv_weight
        loss += smooth_l1(juvd_pd_s[sl], juvd_gt) * cfg.coord_weight
        loss += smooth_l1(mano_jxyz_s[sl], jxyz_gt) * cfg.coord_weight
        loss += smooth_l1(mesh_s[sl], vxyz_gt) * cfg.coord_weight
        loss += coll_s[sl].mean() * cfg.coll_weight
        metrics[f"synth_error_{idx}"] = xyz2error_mm(mano_jxyz_s[sl], jxyz_gt,
                                                     center_s, cube_s)

    # ---------------- real: stage-2 is the teacher (ref :670-703)
    state2 = state1
    pixel_t = jax.lax.stop_gradient(outputs_r[1][0])
    para_t = jax.lax.stop_gradient(outputs_r[1][1])
    juvd_t = jax.lax.stop_gradient(
        offset2joint_softmax(pixel_t, img_r, cfg.feature_para[0]))
    jxyz_t = geo.uvd_nl_to_xyz_nl(juvd_t, center_r, M_r, cube_r, r.paras,
                                  cfg.input_size, r.flip)
    mano_jxyz_t, mano_mesh_t = rnd.get_mesh_xyz(r, para_t)
    mano_jxyz_t = jax.lax.stop_gradient(mano_jxyz_t)
    mano_mesh_t = jax.lax.stop_gradient(mano_mesh_t)

    crop_img, seg_img, joint_pcl, seg, pcl = _prep_real(
        r, cfg, k_prep, img_r, center_r, M_r, cube_r,
        jxyz_t, mano_jxyz_t, mano_mesh_t)

    # stage-stacked decode of both real outputs
    pixel_r2 = jnp.concatenate([outputs_r[0][0], outputs_r[1][0]], axis=0)
    juvd_r2 = offset2joint_softmax(pixel_r2, two(img_r), cfg.feature_para[0])
    jxyz_r2 = geo.uvd_nl_to_xyz_nl(juvd_r2, two(center_r), two(M_r),
                                   two(cube_r), r.paras, cfg.input_size,
                                   r.flip)

    # both stages' loss renders (the reference renders each separately,
    # :719 and :759) run as ONE [stage1 | stage2] raster at 2B
    para_r2 = jnp.concatenate([outputs_r[0][1], outputs_r[1][1]], axis=0)
    mano_img_r2, mano_juvd_r2, mano_jxyz_r2, mesh_r2 = rnd.render_params(
        r, para_r2, two(center_r), two(cube_r))

    coll_r2 = sph.collision_loss(r.mano, mano_jxyz_r2,
                                 jax.lax.stop_gradient(mesh_r2),
                                 keep_batch=True)
    mano_img_crop2 = cloud.crop_hand(mano_img_r2, two(mano_jxyz_t),
                                     two(center_r), two(M_r), two(cube_r),
                                     r.paras, cfg.input_size, flip=r.flip)
    m2d_b2 = _m2d(two(crop_img), mano_img_crop2)           # (2B, 1)
    d2m_b2, pd2m_joint2 = icp_and_joint_icp(
        mesh_r2, two(pcl), two(joint_pcl), r.mano.faces,
        r.mano.joint_face_mask, two(seg))

    nt = len(transfer_map)
    for idx in range(2):
        sl = slice(idx * B, (idx + 1) * B)
        juvd_r, jxyz_r = juvd_r2[sl], jxyz_r2[sl]
        mano_juvd_r, mano_jxyz_r = mano_juvd_r2[sl], mano_jxyz_r2[sl]
        metrics[f"pixel_error_{idx}"] = xyz2error_mm(
            _transfer_slice(jxyz_r, transfer_map)[:, :nt],
            xyz_gt_r[:, :nt], center_r, cube_r, dataset=cfg.dataset)
        metrics[f"mano_error_{idx}"] = xyz2error_mm(
            _transfer_slice(mano_jxyz_r, transfer_map)[:, :nt],
            xyz_gt_r[:, :nt], center_r, cube_r, dataset=cfg.dataset)

        if idx == 0:
            # stage 1 distills from the stage-2 teacher (ref :706-724)
            loss += smooth_l1(pixel_r2[sl], pixel_t) * cfg.deconv_weight
            loss += smooth_l1(juvd_r, juvd_t) * cfg.coord_weight
            loss += smooth_l1(mano_jxyz_r, jxyz_t) * cfg.coord_weight
            loss += smooth_l1(mesh_r2[sl], mano_mesh_t) * cfg.coord_weight
        else:
            # stage-2 P2M against the (detached) teacher pixels (ref :766)
            p2m = smooth_l1(mano_juvd_r, juvd_t) * cfg.coord_weight
            loss += p2m
            metrics["P2M"] = p2m

        coll = coll_r2[sl].mean()
        loss += coll * cfg.coll_weight
        m2d = m2d_b2[sl].mean() * 0.1
        loss += m2d * cfg.model_weight
        pd2m = pd2m_joint2[sl].mean()
        loss += pd2m * cfg.partICP_weight
        d2m = d2m_b2[sl].mean()
        loss += d2m * cfg.model_weight

        if idx == 1:
            m2p_mask = _m2p_mask(crop_img, mano_img_crop2[sl], d2m_b2[sl],
                                 pd2m_joint2[sl])
            m2p = _masked_select_sl1(
                juvd_r, jax.lax.stop_gradient(mano_juvd_r),
                jax.lax.stop_gradient(m2p_mask)) * cfg.coord_weight
            loss += m2p * cfg.M2P_weight
            metrics["M2P"] = m2p
        metrics[f"m2d_{idx}"] = m2d
        metrics[f"d2m_{idx}"] = d2m
        metrics[f"pd2m_{idx}"] = pd2m
        metrics[f"coll_{idx}"] = coll

    return loss, (state2, metrics)
