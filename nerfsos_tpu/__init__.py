"""nerfsos_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
VITA-Group/NeRF-SOS ("Any-View Self-supervised Object Segmentation", ICLR'23).

Layer map (mirrors SURVEY.md of the reference, re-designed TPU-first):

- ``core``     : ray/camera math, positional encoders, samplers, volumetric
                 compositing — pure ``jax.numpy``, fixed shapes.
- ``models``   : flax NeRF MLPs (with the semantic head), coarse/fine render
                 orchestration, mip-NeRF, voxel fields, DINO ViT-S/16.
- ``ops``      : TPU compute primitives — Pallas fused field kernels, bilinear
                 grid-sample, jittable k-means, SSIM.
- ``losses``   : photometric MSE, appearance/geometry correlation losses,
                 contrastive loss.
- ``parallel`` : device mesh + sharding helpers (data-parallel ray sharding
                 over ICI; replicated params).
- ``data``     : offline dataset generation (`.npy` contract identical to the
                 reference) and host-side online samplers.
- ``engines``  : config, train state (optax), train steps, checkpointing
                 (orbax + torch-ckpt converter), eval/render/export.
"""

__version__ = "0.1.0"
