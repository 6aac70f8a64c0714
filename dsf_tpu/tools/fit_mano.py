"""Per-batch MANO parameter fitting by gradient descent ("IK").

Rebuild of the reference's offline `opt_depth` tool
(render_loader.py:3594-3653), which produced the posePara_lm_collosion
parameter banks: optimize 62-D MANO params with Adam so the rendered
depth + projected joints match a target depth crop (+ optional joint
labels), under the same regularizers the trainer uses (beta prior,
collision).  Runs fully on-device; one jit'd update step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from dsf_tpu.losses.basic import smooth_l1, masked_depth_loss
from dsf_tpu.mano import model as mano_model
from dsf_tpu.mano import spheres as sph
from dsf_tpu.render import renderer as rnd


def fit_params_world(mano: mano_model.ManoModel, pcl_xyz, joints_xyz,
                     quat, theta, cam, beta=None,
                     steps: int = 1000, lr: float = 0.01):
    """The reference `opt_depth` objective, exactly
    (render_loader.py:3594-3653): Adam over (quat, theta, beta, cam)
    minimizing torch-default SmoothL1(joints, labels) + mean(beta²) +
    mean(theta²) + mean(min over verts of squared pcl→vertex distance),
    all in world mm.  beta starts at zeros like the reference (:3614).

    pcl_xyz: (B, P, 3) mm; joints_xyz: (B, 21, 3) mm.
    Returns (params dict, loss history list).
    """
    params = {
        "quat": jnp.asarray(quat, jnp.float32),
        "theta": jnp.asarray(theta, jnp.float32),
        "beta": (jnp.zeros((quat.shape[0], 10), jnp.float32)
                 if beta is None else jnp.asarray(beta, jnp.float32)),
        "cam": jnp.asarray(cam, jnp.float32),
    }
    pcl_xyz = jnp.asarray(pcl_xyz, jnp.float32)
    joints_xyz = jnp.asarray(joints_xyz, jnp.float32)
    tx = optax.adam(lr)                    # torch Adam defaults == optax's
    opt_state = tx.init(params)

    def loss_fn(p):
        verts, joints = mano_model.get_mano_vertices(
            mano, p["quat"], p["theta"], p["beta"], p["cam"])
        z = joints - joints_xyz
        az = jnp.abs(z)
        sl1 = jnp.where(az < 1.0, 0.5 * z * z, az - 0.5).mean()
        d2 = jnp.sum((pcl_xyz[:, :, None] - verts[:, None]) ** 2,
                     axis=-1).min(-1)      # (B, P) squared, like the ref
        return (sl1 + (p["beta"] ** 2).mean() + (p["theta"] ** 2).mean()
                + d2.mean())

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        history.append(float(loss))
    return params, history


def fit_params(r: rnd.Renderer, target_img, center, cube,
               target_joints_xyz=None, init_params=None,
               steps: int = 200, lr: float = 0.01,
               joint_w: float = 100.0, depth_w: float = 1.0,
               beta_w: float = 10.0, coll_w: float = 1.0):
    """Fit (B, 62) MANO params to normalized depth crops.

    target_img: (B, 1, S, S) normalized depth; center/cube: (B, 3);
    target_joints_xyz: optional (B, 21, 3) normalized-xyz labels.
    Returns (params, final_loss_dict).
    """
    B = target_img.shape[0]
    if init_params is None:
        init = jnp.zeros((B, 62))
        init = init.at[:, 58].set(1.0)       # scale
        params = init
    else:
        params = init_params

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p):
        img, juvd, jxyz, mesh = rnd.render_params(r, p, center, cube)
        m2d = masked_depth_loss(img, target_img).mean()
        beta_loss = jnp.mean(p[:, 48:58] ** 2)
        coll = sph.collision_loss(r.mano, jxyz, jax.lax.stop_gradient(mesh))
        loss = depth_w * m2d + beta_w * beta_loss + coll_w * coll
        aux = {"m2d": m2d, "beta": beta_loss, "coll": coll}
        if target_joints_xyz is not None:
            jl = smooth_l1(jxyz, target_joints_xyz) * joint_w
            loss = loss + jl
            aux["joint"] = jl
        return loss, aux

    @jax.jit
    def step(params, opt_state):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    aux = {}
    for _ in range(steps):
        params, opt_state, loss, aux = step(params, opt_state)
    return params, {k: float(v) for k, v in dict(aux, loss=loss).items()}
