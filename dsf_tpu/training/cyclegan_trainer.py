"""Consis-CycleGAN training: learn the synth->real depth transfer net.

The reference CONSUMES an externally-trained generator
(`latest_net_G_A.pth` from the pytorch-CycleGAN repo,
train_render.py:95-100) — the training itself lives outside the repo.
This module provides the missing piece natively: a CycleGAN trainer
over (synth depth crop, real depth crop) batches with the standard
lsgan + cycle + identity losses, plus the "consis" background/structure
consistency term (foreground-mask preservation between input and
translated output) that the DSF paper's transfer variant uses.

All four nets and both optimizers step inside one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dsf_tpu.models.cyclegan import (ResnetGenerator, NLayerDiscriminator,
                                     gan_loss)


class CycleGANState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any          # {'G_A': synth->real, 'G_B': real->synth}
    d_params: Any          # {'D_A': judges real domain, 'D_B': synth domain}
    g_opt: Any
    d_opt: Any


@dataclasses.dataclass
class CycleGANTrainer:
    lr: float = 2e-4
    lambda_cycle: float = 10.0
    lambda_identity: float = 5.0
    lambda_consis: float = 1.0
    ngf: int = 64
    n_blocks: int = 9
    compute_dtype: Any = None

    def __post_init__(self):
        dt = self.compute_dtype
        self.G_A = ResnetGenerator(ngf=self.ngf, n_blocks=self.n_blocks,
                                   dtype=dt)
        self.G_B = ResnetGenerator(ngf=self.ngf, n_blocks=self.n_blocks,
                                   dtype=dt)
        self.D_A = NLayerDiscriminator(dtype=dt)
        self.D_B = NLayerDiscriminator(dtype=dt)
        self.g_tx = optax.adam(self.lr, b1=0.5)
        self.d_tx = optax.adam(self.lr, b1=0.5)

    def init_state(self, key, img_shape=(1, 1, 128, 128)) -> CycleGANState:
        kA, kB, kDA, kDB = jax.random.split(key, 4)
        x = jnp.zeros(img_shape)
        g_params = {"G_A": self.G_A.init(kA, x)["params"],
                    "G_B": self.G_B.init(kB, x)["params"]}
        d_params = {"D_A": self.D_A.init(kDA, x)["params"],
                    "D_B": self.D_B.init(kDB, x)["params"]}
        return CycleGANState(
            step=jnp.zeros((), jnp.int32), g_params=g_params,
            d_params=d_params, g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params))

    # ------------------------------------------------------------------

    def _g_loss(self, g_params, d_params, synth, real):
        fake_real = self.G_A.apply({"params": g_params["G_A"]}, synth)
        fake_synth = self.G_B.apply({"params": g_params["G_B"]}, real)
        rec_synth = self.G_B.apply({"params": g_params["G_B"]}, fake_real)
        rec_real = self.G_A.apply({"params": g_params["G_A"]}, fake_synth)
        idt_real = self.G_A.apply({"params": g_params["G_A"]}, real)
        idt_synth = self.G_B.apply({"params": g_params["G_B"]}, synth)

        adv_A = gan_loss(self.D_A.apply({"params": d_params["D_A"]},
                                        fake_real), True)
        adv_B = gan_loss(self.D_B.apply({"params": d_params["D_B"]},
                                        fake_synth), True)
        cyc = (jnp.abs(rec_synth - synth).mean()
               + jnp.abs(rec_real - real).mean()) * self.lambda_cycle
        idt = (jnp.abs(idt_real - real).mean()
               + jnp.abs(idt_synth - synth).mean()) * self.lambda_identity
        # consis: translation must not move foreground/background structure
        # (depth crops: background is +1) — penalize foreground-mask drift
        fg_s = jnp.tanh((0.99 - synth) * 20.0).clip(0, 1)
        fg_fr = jnp.tanh((0.99 - fake_real) * 20.0).clip(0, 1)
        fg_r = jnp.tanh((0.99 - real) * 20.0).clip(0, 1)
        fg_fs = jnp.tanh((0.99 - fake_synth) * 20.0).clip(0, 1)
        consis = (jnp.abs(fg_s - fg_fr).mean()
                  + jnp.abs(fg_r - fg_fs).mean()) * self.lambda_consis
        loss = adv_A + adv_B + cyc + idt + consis
        aux = {"adv_A": adv_A, "adv_B": adv_B, "cycle": cyc,
               "identity": idt, "consis": consis,
               "fake_real": fake_real, "fake_synth": fake_synth}
        return loss, aux

    def _d_loss(self, d_params, synth, real, fake_real, fake_synth):
        dA_real = self.D_A.apply({"params": d_params["D_A"]}, real)
        dA_fake = self.D_A.apply({"params": d_params["D_A"]},
                                 jax.lax.stop_gradient(fake_real))
        dB_real = self.D_B.apply({"params": d_params["D_B"]}, synth)
        dB_fake = self.D_B.apply({"params": d_params["D_B"]},
                                 jax.lax.stop_gradient(fake_synth))
        loss = 0.5 * (gan_loss(dA_real, True) + gan_loss(dA_fake, False)
                      + gan_loss(dB_real, True) + gan_loss(dB_fake, False))
        return loss

    def train_step_fn(self):
        def step(state: CycleGANState, synth, real):
            (g_loss, aux), g_grads = jax.value_and_grad(
                self._g_loss, has_aux=True)(state.g_params, state.d_params,
                                            synth, real)
            g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                                state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)

            d_loss, d_grads = jax.value_and_grad(self._d_loss)(
                state.d_params, synth, real, aux["fake_real"],
                aux["fake_synth"])
            d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                                state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)

            metrics = {k: v for k, v in aux.items()
                       if not k.startswith("fake")}
            metrics.update(g_loss=g_loss, d_loss=d_loss)
            return state.replace(step=state.step + 1, g_params=g_params,
                                 d_params=d_params, g_opt=g_opt,
                                 d_opt=d_opt), metrics

        return jax.jit(step, donate_argnums=(0,))

    def export_transfer_variables(self, state: CycleGANState):
        """The frozen synth->real generator in the format the Trainer's
        transfer net consumes."""
        return {"params": state.g_params["G_A"]}
