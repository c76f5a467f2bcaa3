from .mesh import make_mesh
from .mesh import shard_batch
from .mesh import replicate
from .train import make_sharded_train_step
from .train import make_sharded_eval_step
from .checkpoint import load_checkpoint
from .checkpoint import save_checkpoint
