"""Checkpoint save/restore roundtrip (orbax) with reference semantics:
full resume restores optimizer+epoch, finetune warm start restores
weights only (train_render.py:119-149)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu.config import Config
from dsf_tpu.training.trainer import Trainer
from dsf_tpu.training import checkpoints as ckpt


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    from dsf_tpu.mano import synthetic
    path = tmp_path_factory.mktemp("mano") / "syn.npz"
    synthetic.save_synthetic_mano(str(path))
    cfg = Config(dataset="nyu", batch_size=4, stage_num=1,
                 train_stage="Pretrain", input_size=64)
    return Trainer(cfg, str(path), steps_per_epoch=5)


def test_checkpoint_roundtrip(trainer, tmp_path):
    state = trainer.init_state()
    # mutate: bump step + params
    state = state.replace(
        step=jnp.int32(7),
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params))
    ckpt.save(str(tmp_path / "latest"), trainer, state, epoch=3)

    fresh = trainer.init_state()
    restored, epoch = ckpt.restore(str(tmp_path / "latest"), trainer, fresh)
    assert epoch == 4                     # resume at saved epoch + 1
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_weights_only_restore(trainer, tmp_path):
    state = trainer.init_state()
    state = state.replace(step=jnp.int32(9))
    ckpt.save(str(tmp_path / "best"), trainer, state, epoch=5)
    fresh = trainer.init_state()
    restored, epoch = ckpt.restore(str(tmp_path / "best"), trainer, fresh,
                                   weights_only=True)
    assert epoch == 0                     # warm start: epoch not resumed
    assert int(restored.step) == 0        # optimizer/step reset
