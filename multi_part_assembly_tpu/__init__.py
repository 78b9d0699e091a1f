"""multi_part_assembly_tpu: TPU-native 3D multi-part shape assembly.

A brand-new JAX/XLA/Pallas framework with the capabilities of the PyTorch
`multi_part_assembly` benchmark codebase (Breaking Bad / PartNet assembly),
re-designed TPU-first: fixed-shape padded batches, fused Pallas kernels for
the Chamfer/kNN hot loops, vmapped MoN sampling, a device-side Hungarian
matcher, pjit data parallelism over a device mesh, and Orbax checkpointing.
"""

__version__ = '0.1.0'
