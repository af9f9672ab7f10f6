"""tiseg_tpu: a TPU-native (JAX/Flax/Pallas) framework for nuclei/tissue
instance segmentation in histopathology images.

Re-designed from scratch with the capabilities of the PyTorch reference
``clownrat6/Tissue-Image-Segmentation`` (``tiseg``): a config-driven model
zoo (UNet, CUNet, DCAN, DIST, MicroNet, CMicroNet, FullNet, CDNet, HoVer-Net,
multi-task variants), dataset converters & loaders, rich label-map
generation, sliding-window + TTA inference, on-device instance
post-processing, and AJI/PQ/Dice evaluation — all built TPU-first: NHWC,
jit-everything, batch-of-patches data parallelism over a device mesh.
"""

__version__ = '0.1.0'

from . import utils  # noqa: F401
