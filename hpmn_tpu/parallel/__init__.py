from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh,
                   param_shardings, replicated, shard_batch)
from .embedding_sharding import make_sharded_lookup, pad_vocab
from .train_step import init_sharded_model, make_sharded_steps

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
           "param_shardings", "replicated", "shard_batch",
           "make_sharded_lookup", "pad_vocab", "init_sharded_model",
           "make_sharded_steps"]
