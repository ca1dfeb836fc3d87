"""kpdiff_tpu — a TPU-native framework for keypoint-conditioned molecular diffusion.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Dunni3/keypoint-diffusion (structure-based drug design with an
E(3)-equivariant DDPM conditioned on learned receptor "keypoints").

Design principles (vs. the torch/DGL reference):
  * fixed-shape padded tensors + masks instead of mutable heterographs
    (the reference's batch bookkeeping at utils.py:81-156 disappears)
  * reverse diffusion is ONE `jax.lax.scan` inside a single jit
    (the reference dispatches 1000 separate python steps,
     ligand_diffuser.py:404-410)
  * neighbor recomputation per step is masked top-k over static shapes
    (replaces torch_cluster radius/knn, dynamics.py:387-420)
  * data parallel scaling via jax.sharding.Mesh + shard_map collectives
    (the reference is single-GPU only)
"""

__version__ = "0.1.0"
