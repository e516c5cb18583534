"""ossid_code_tpu — TPU-native rebuild of the OSSID online self-supervised
detect-and-pose pipeline (reference: r-pad/OSSID_code).

Layers (bottom-up):
  core/       config tree, checkpointing (orbax + torch state_dict import), timing
  utils/      host-side geometry / image / homography helpers (numpy)
  ops/        device-side ops (jax/jnp + pallas): NMS, correlation, resize, FPS, ...
  models/     flax modules: DTOID detector, Zephyr PointNet2 scorer, backbones
  data/       BOP disk reader, template grids, batching + device prefetch
  hypo/       host-side pose-hypothesis generation (PPF C++, SIFT, Fake)
  render/     depth rasterization for pseudo-label masks + visibility masks
  loop/       the OSSID online learning driver
  train/      offline pretraining (pjit data-parallel)
  parallel/   device mesh + sharding helpers
  eval/       BOP CSV writer, ADD/ADD-S, VOC detection mAP
"""

__version__ = "0.1.0"
