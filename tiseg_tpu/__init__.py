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

import os as _os

if _os.environ.get('JAX_PLATFORMS'):
    # Honor the env var as documented jax behavior. Some images register
    # an out-of-tree PJRT plugin from sitecustomize in a way that defeats
    # env-level platform selection (jax then initializes — and, with the
    # device tunnel down, hangs in — the plugin backend even under
    # JAX_PLATFORMS=cpu). Re-asserting the env value through jax.config
    # before any backend initializes restores the documented semantics;
    # it is a no-op where env selection already works.
    import jax as _jax

    try:
        _jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
    except Exception:
        pass

from . import utils  # noqa: F401
