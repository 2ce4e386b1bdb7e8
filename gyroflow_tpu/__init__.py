"""gyroflow_tpu — TPU-native video stabilization framework.

A from-scratch JAX/Pallas rebuild of the capabilities of gyroflow/gyroflow
(reference engine: Rust + wgpu/OpenCL shaders). Host-side orientation math runs
in numpy f64; the per-pixel undistort/rotate/redistort remap runs on TPU as a
fused JAX/XLA (and Pallas) kernel; frame windows batch via vmap and shard across
chips via jax.sharding.

See SURVEY.md at the repo root for the full reference analysis and build plan.
"""

__version__ = "0.1.0"
