"""morpheus_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
MorpheuS (CVPR 2024): per-scene optimization of a dynamic 360° neural surface from a
single monocular RGB-D video.

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  ops/       — encodings (freq/SH/hash-grid), Laplace density, deform codes, MLPs,
               occupancy grid, fixed-shape volume renderer, marching cubes
  model/     — the hyper-dimensional canonical SDF field + deformation/topology
               networks + per-frame pose correction (reference: models/model.py)
  data/      — RGB-D sequence dataset + virtual-view ray sampling
               (reference: datasets/dataset.py)
  train/     — losses, optimizers (Adam/Adan), curriculum schedules, trainer
               (reference: morpheus.py)
  guidance/  — Zero-1-to-3 score-distillation guidance (reference: models/guidance/)
  eval/      — culling-based 3D metrics, depth-L1, CLIP eval (reference: tools/)
  parallel/  — jax.sharding mesh / pjit scale-out (no reference equivalent: the
               reference is single-GPU; this is the TPU-native scaling layer)
"""

__version__ = "0.1.0"
