"""On-TPU self-supervision efficacy run: does the label-free
FinetuneStage actually IMPROVE accuracy on a shifted "real" domain?

This is the strongest end-to-end validation available without the
licensed assets (SURVEY §6 / VERDICT r2 missing-#1): it exercises the
paper's core claim — the self-boosting losses (P2M/M2P distillation,
m2d masked depth, ICP/part-ICP, collision) adapt a synthetic-pretrained
model to a real domain WITHOUT labels (ref train_render.py:622-823).

Protocol (controlled, single seed):
  1. Build a fake-NYU dataset with the device rasterizer
     (dsf_tpu.data.fake.make_fake_nyu): full rotation range ±π,
     pose std 0.3 — ground truth known by construction.
  2. Pretrain K1 steps on synthetic params drawn from a NARROWER
     distribution (rot ±1 rad — the convergence-run distribution), so
     the "real" set is genuinely out-of-domain.
  3. Evaluate on the fake-NYU test split           -> E_pretrain
  4a. CONTROL: K2 MORE Pretrain steps              -> E_control
  4b. TREATMENT (from the same step-3 state): K2 FinetuneStage steps
      feeding real images through the production prefetch pipeline
      (augmented crops, worker pool) — labels NEVER enter the loss
      (xyz_gt is monitoring-only in phases.finetune_stage_loss)
                                                    -> E_selfsup
  5. PASS iff stage-2 E_selfsup < E_control AND < E_pretrain for both
     branches (pixel + MANO).

The frozen transfer net is identity here (transferNet_pth=""): the
fake-real images come from the same renderer, so a domain-translation
G has nothing to translate; keeping it out isolates the self-
supervision effect.  (bench.py keeps the cost-faithful random G — that
is a THROUGHPUT stand-in, not a science configuration.)

Writes the summary + curves to --out (default /tmp/dsf_selfsup.json).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("DSF_COMPUTE_DTYPE", "bfloat16")
    K1 = int(os.environ.get("SELFSUP_PRETRAIN_STEPS", "1200"))
    SEED = int(os.environ.get("SELFSUP_SEED", "0"))   # offsets init + all
    # PRNG streams + data order; the fake-NYU set itself stays fixed
    K2 = int(os.environ.get("SELFSUP_STEPS", "600"))
    out_path = os.environ.get("SELFSUP_OUT", "/tmp/dsf_selfsup.json")
    data_root = os.environ.get("SELFSUP_DATA", "/tmp/dsf_fake_nyu_r4")

    import jax
    import jax.numpy as jnp
    from dsf_tpu.config import Config
    from dsf_tpu.data import datasets as D
    from dsf_tpu.data.fake import make_fake_nyu
    from dsf_tpu.mano import synthetic
    from dsf_tpu.parallel import mesh as pmesh
    from dsf_tpu.training.trainer import Trainer

    mano_path = "/tmp/dsf_graft_syn_mano.npz"
    if not os.path.exists(mano_path):
        synthetic.save_synthetic_mano(mano_path)

    B = 32
    cfg = Config(dataset="nyu", batch_size=B, stage_num=2, input_size=128,
                 transferNet_pth="", compute_dtype="bfloat16")
    tr = Trainer(cfg, mano_path, steps_per_epoch=1000)

    # ---- 1. fake-NYU ("real" domain: full ±π rotations)
    if not os.path.isdir(os.path.join(data_root, "nyu", "train")):
        t0 = time.time()
        make_fake_nyu(data_root, mano_path, n_train=512, n_test=128, seed=7)
        print(f"fake-NYU built in {time.time() - t0:.0f}s", flush=True)
    nyu_root = os.path.join(data_root, "nyu")
    train_ds = D.NYUDataset(nyu_root, "train", img_size=128,
                            aug_para=cfg.augment_para)
    test_ds = D.NYUDataset(nyu_root, "test", view=0, img_size=128)

    rng = np.random.RandomState(SEED)

    def synth_params():
        # the NARROW pretraining distribution (rot ±1 rad vs the real
        # set's ±π) — the controlled domain gap
        return {
            "model_para": jnp.asarray(np.concatenate(
                [rng.uniform(-1, 1, (B, 3)), rng.randn(B, 45) * 0.5,
                 rng.randn(B, 10) * 0.5, np.ones((B, 1)),
                 np.zeros((B, 3))], axis=1).astype(np.float32)),
            "cube_synth": jnp.full((B, 3), 250.0),
        }

    def eval_state(state):
        def batches():
            for b in test_ds.batches(B, shuffle=False, drop_last=True):
                yield {k: jnp.asarray(v) for k, v in b.items()
                       if k in ("img", "xyz_gt", "center", "M", "cube")}
        e = np.asarray(tr.evaluate(state, batches()))
        # order per eval_step_fn: [pix0, mano0, pix1, mano1]
        return {"pixel_mm_s1": round(float(e[0]), 2),
                "mano_mm_s1": round(float(e[1]), 2),
                "pixel_mm_s2": round(float(e[2]), 2),
                "mano_mm_s2": round(float(e[3]), 2)}

    def snapshot(state):
        return jax.tree_util.tree_map(np.asarray, state)

    def restore(host_state):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, pmesh.replicated_sharding(tr.mesh)), host_state)

    # ---- 2. pretrain K1 on the narrow synth distribution
    state = tr.init_state(seed=SEED)
    pre_step = tr.train_step_fn("Pretrain")
    key = jax.random.PRNGKey(SEED * 100)
    t0 = time.perf_counter()
    for i in range(K1):
        key, sub = jax.random.split(key)
        state, metrics = pre_step(state, sub, synth_params())
        if i % 200 == 0:
            print(json.dumps({"phase": "pretrain", "step": i,
                              "loss": float(metrics["loss"])}), flush=True)
    jax.block_until_ready(metrics["loss"])
    t_pre = time.perf_counter() - t0
    base = snapshot(state)

    # ---- 3. post-pretrain eval
    e_pretrain = eval_state(state)
    print(json.dumps({"eval": "pretrain", **e_pretrain}), flush=True)

    # ---- 4a. control: K2 MORE pretrain steps
    k_ctrl = jax.random.PRNGKey(SEED * 100 + 1)
    for i in range(K2):
        k_ctrl, sub = jax.random.split(k_ctrl)
        state, metrics = pre_step(state, sub, synth_params())
    jax.block_until_ready(metrics["loss"])
    e_control = eval_state(state)
    print(json.dumps({"eval": "control", **e_control}), flush=True)

    # ---- 4b. treatment: K2 FinetuneStage steps from the SAME base state
    state = restore(base)
    fin_step = tr.train_step_fn("FinetuneStage")
    k_fin = jax.random.PRNGKey(SEED * 100 + 1)
    real_it = train_ds.prefetch_batches(B, shuffle=True, loop=True,
                                        drop_last=True, seed=SEED * 100 + 3)
    t0 = time.perf_counter()
    for i in range(K2):
        rb = next(real_it)
        batch = dict(synth_params(),
                     img=jnp.asarray(rb["img"]),
                     xyz_gt=jnp.asarray(rb["xyz_gt"]),
                     center=jnp.asarray(rb["center"]),
                     M=jnp.asarray(rb["M"]),
                     cube=jnp.asarray(rb["cube"]))
        k_fin, sub = jax.random.split(k_fin)
        state, metrics = fin_step(state, sub, batch)
        if i % 100 == 0:
            print(json.dumps(
                {"phase": "selfsup", "step": i,
                 "loss": float(metrics["loss"]),
                 "mano_error_1": float(metrics["mano_error_1"])}),
                flush=True)
    jax.block_until_ready(metrics["loss"])
    t_fin = time.perf_counter() - t0
    e_selfsup = eval_state(state)
    print(json.dumps({"eval": "selfsup", **e_selfsup}), flush=True)

    ok = all(e_selfsup[k] < e_control[k] and e_selfsup[k] < e_pretrain[k]
             for k in ("pixel_mm_s2", "mano_mm_s2"))
    summary = {
        "K1_pretrain": K1, "K2": K2, "seed": SEED,
        "pretrain_fps": round(K1 * B / t_pre, 1),
        "selfsup_fps": round(K2 * B / t_fin, 1),
        "e_pretrain": e_pretrain, "e_control": e_control,
        "e_selfsup": e_selfsup, "ok": bool(ok),
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
