from .builder import DATASETS, DataLoader, EpochSampler, build_dataloader, build_dataset, collate
from .custom import (CustomDataset, MoNuSegDataset, CPM17Dataset, CoNSePDataset, GlasDataset, OSCDDataset)
from .conic import CoNICDataset
from .mapper import DatasetMapper, read_image
from . import ops, utils  # noqa: F401

__all__ = [
    'DATASETS', 'DataLoader', 'EpochSampler', 'build_dataloader', 'build_dataset', 'collate', 'CustomDataset',
    'MoNuSegDataset', 'CPM17Dataset', 'CoNSePDataset', 'GlasDataset', 'OSCDDataset', 'CoNICDataset', 'DatasetMapper',
    'read_image'
]
