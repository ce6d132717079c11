"""TPU-native 3D U-Net framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of wolny/pytorch-3dunet for TPU:
Flax models with channels-last layouts sized for the MXU, jit/pjit end-to-end
train and sliding-window inference, and an async host data pipeline. The YAML
config schema and the ``train3dunet`` / ``predict3dunet`` CLIs are preserved.
"""

from pytorch3dunet_tpu.__version__ import __version__

__all__ = ["__version__"]
