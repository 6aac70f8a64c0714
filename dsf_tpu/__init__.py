"""dsf_tpu — a TPU-native self-supervised 3D hand pose + MANO mesh framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PengfeiRen96/DSF
("Dual-Branch Self-Boosting Framework for Self-Supervised 3D Hand Pose
Estimation", TIP 2022).  The compute path (MANO LBS, differentiable depth
rasterization, dense-offset codec, self-supervision losses, dual-branch CNN)
lives in a single jit-compiled train step; parallelism is expressed with
`jax.sharding` over a device mesh.

Layer map (mirrors reference SURVEY.md §1):
  geometry      — camera/crop/warp math           (ref: data/render_loader.py:70-353)
  mano          — MANO LBS + sphere hand model    (ref: render_model/mano_layer.py)
  ops           — rasterizer, point-mesh distance, offset codec, grid sampling
  render        — differentiable synth-sample factory (ref: Render)
  models        — Flax dual-branch ResNet, hourglass, CycleGAN transfer net
  losses        — SmoothL1, ICP family, depth/collision losses
  data          — dataset readers + host pipeline  (ref: data/render_loader.py)
  training      — phases (Pretrain/Finetune/FinetuneStage), trainer, eval
  parallel      — mesh/sharding helpers
  serving       — production inference engine + jax.export artifacts
  tools         — offline eval (collision volume, CCSSL TTA, skeleton export)
"""

__version__ = "0.1.0"
