"""MeMOTR-TPU: a TPU-native (JAX/XLA/Pallas/pjit) memory-augmented multi-object
tracking framework.

A from-scratch re-design of the capabilities of MCG-NJU/MeMOTR (ICCV 2023) for
TPU hardware:

- the CUDA multi-scale deformable attention extension is replaced by a fused
  Pallas kernel (with a pure-JAX oracle used for testing and CPU fallback),
- the ragged, per-frame-variable ``TrackInstances`` structure is replaced by a
  fixed-shape track-slot pytree (``memotr_tpu.structures.TrackState``) so the
  per-frame step compiles exactly once and streams without retracing,
- data parallelism uses ``jax.sharding.Mesh`` + XLA collectives instead of
  NCCL process groups,
- Hungarian matching runs in-graph as a pure-JAX solver (no host sync),
- checkpoints use Orbax, with a converter from the released PyTorch weights.
"""

__version__ = "0.1.0"
