from .mesh import (batch_sharding, init_distributed, make_eval_step,
                   make_eval_step_stacked, make_mesh, make_train_step,
                   make_train_step_stacked, replicated, shard_batch)
