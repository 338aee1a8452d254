from .mesh import batch_sharding, make_mesh, replicated, shard_batch
from .train_step import TrainState, init_train_state, make_eval_fn, make_train_fn, train_step
