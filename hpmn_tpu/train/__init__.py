from .train import (train, make_train_step, make_multistep_train,
                    chunk_batches, make_eval_step, make_datasets)
from .evaluate import evaluate
from . import metrics
from .checkpoint import CheckpointManager

__all__ = ["train", "make_train_step", "make_multistep_train",
           "chunk_batches", "make_eval_step", "make_datasets",
           "evaluate", "metrics", "CheckpointManager"]
