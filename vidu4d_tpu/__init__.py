"""vidu4d_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the Vidu4D pipeline.

Vidu4D reconstructs a high-fidelity 4D asset (dynamic Gaussian surfels) from a
single monocular video in three stages:

  1. preprocess  — frames/masks/flow/depth/features/cameras (``vidu4d_tpu.preprocess``)
  2. neural SDF  — canonical VolSDF + neural blend-skinning warp (``vidu4d_tpu.models``)
  3. surfels     — dynamic 2D Gaussian surfels rasterized with a Pallas
                   tile kernel (``vidu4d_tpu.ops.rasterize``)

This is a from-scratch TPU-first design with the same capabilities as the
reference CUDA/torch implementation (yikaiw/Vidu4D); see SURVEY.md at the repo
root for the blueprint and per-component reference citations.
"""

__version__ = "0.1.0"
