"""parallelwavegan_tpu — TPU-native GAN vocoder framework (JAX/XLA/Pallas).

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
ParallelWaveGAN reference toolkit (kan-bayashi/ParallelWaveGAN fork), built
TPU-first: channels-last layouts, MXU-friendly matmul STFTs, jit/pjit SPMD
training over `jax.sharding.Mesh`, and Pallas kernels for hot ops.
"""

__version__ = "0.1.0"
