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
from dsf_tpu.mano import spheres as sph
from dsf_tpu.render import renderer as rnd


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
