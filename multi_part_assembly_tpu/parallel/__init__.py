from .mesh import (batch_sharding, init_distributed, make_eval_step,
                   make_mesh, make_train_step, replicated, shard_batch)
