from .schema import Batch, batch_from_numpy, dummy_batch
from .loader import DataLoader
from .synthetic import (AMAZON, TAOBAO, XLONG, SPECS, DatasetSpec,
                        make_ctr_dataset, make_periodic_dataset,
                        train_val_test_split)

__all__ = [
    "Batch", "batch_from_numpy", "dummy_batch", "DataLoader",
    "AMAZON", "TAOBAO", "XLONG", "SPECS", "DatasetSpec",
    "make_ctr_dataset", "make_periodic_dataset", "train_val_test_split",
]
