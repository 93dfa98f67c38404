"""itermvs_tpu — a TPU-native (JAX / Flax / Pallas) multi-view-stereo framework.

Re-designed from scratch with the capabilities of IterMVS (CVPR 2022):
iterative probability estimation over inverse depth for efficient
multi-view stereo. The compute path is pure JAX/XLA with Pallas kernels
for the hot plane-sweep warp+correlation op; parallelism is expressed as
`jax.sharding` over a device mesh (data-parallel over ICI).

Public surface:
    itermvs_tpu.models   — Flax modules (FeatureNet, IterMVS, Pipeline) + loss
    itermvs_tpu.ops      — geometry / sampling / resize primitives
    itermvs_tpu.io       — PFM / cam-txt / pair-txt / PLY codecs
    itermvs_tpu.data     — dataset loaders (dtu, blendedmvs, tanks, eth3d, custom)
    itermvs_tpu.fusion   — photometric+geometric depth-map fusion to point clouds
    itermvs_tpu.engine   — train/eval loops, checkpointing, torch-ckpt import
    itermvs_tpu.parallel — device-mesh helpers (data parallel over ICI)
"""

__version__ = "0.1.0"
