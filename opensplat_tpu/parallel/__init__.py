from .mesh import make_mesh, shard_params, replicate
from .sharded_train import batched_train_step
