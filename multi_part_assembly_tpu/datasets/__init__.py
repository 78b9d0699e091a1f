"""Dataset dispatch (reference: multi_part_assembly/datasets/__init__.py:5-11)."""

from .geometry import (GeometryPartDataset, augment_geometry_batch,
                       build_geometry_dataloader)
from .loader import DataLoader
from .mesh_io import MeshSampler, native_available
from .partnet import PartNetPartDataset, build_partnet_dataloader

__all__ = [
    'build_dataloader', 'GeometryPartDataset', 'PartNetPartDataset',
    'DataLoader', 'MeshSampler', 'augment_geometry_batch',
    'build_geometry_dataloader', 'build_partnet_dataloader',
    'native_available',
]


def build_dataloader(cfg):
    if cfg.data.dataset == 'partnet':
        return build_partnet_dataloader(cfg)
    if cfg.data.dataset == 'geometry':
        return build_geometry_dataloader(cfg)
    raise NotImplementedError(f'Dataset {cfg.data.dataset} not supported')
