"""dropclip_tpu — a TPU-native framework for 3D feature distillation with
object-centric priors (DROP-CLIP capabilities, re-designed for JAX/XLA/Pallas).

Layer map (mirrors the reference's seven layers, re-architected TPU-first):

- ``core``     config / mesh / metrics / schedules / checkpointing / logging
- ``geom``     camera models, SE(3) transforms, projections, voxelization
- ``sparse``   sparse voxel tensors: hashing, kernel maps, sparse conv, UNets
- ``teachers`` JAX CLIP (incl. MaskCLIP patch mode) and DINOv2 encoders
- ``fusion``   multi-view object-centric feature fusion (the paper's core)
- ``distill``  losses, train/eval steps (pjit over a device mesh)
- ``data``     scene formats, readers, augmentations, host pipeline
- ``grasp``    grasp containers and language-conditioned ranking
- ``tools``    CLI entry points

Everything on the device path is static-shape + masked so a single XLA
program covers the whole pipeline; parallelism is expressed as
``jax.sharding`` annotations over a ``Mesh``, never as explicit
process-level communication.
"""

__version__ = "0.1.0"
