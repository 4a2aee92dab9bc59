"""Data pipeline: dataset loading, array loaders, on-device encode configs."""
from .datasets import (
    ArrayDataLoader,
    DatasetId,
    EncodeConfig,
    get_dataloaders,
    load_raw,
    read_idx,
)
