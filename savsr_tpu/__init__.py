"""savsr_tpu: TPU-native arbitrary-scale video super-resolution framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
Weepingchestnut/SAVSR (AAAI 2024, reference layout documented in SURVEY.md).
The compute path is pure JAX (jit/pjit/shard_map + Pallas kernels); the
surrounding runtime (config, registry, data pipeline, training loop,
checkpointing) is Python/C++ with no torch dependency.
"""

__version__ = "0.1.0"
