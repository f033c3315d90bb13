from .mesh import make_mesh, param_shardings, batch_sharding
from .process_data import ProcessTrainShard
from .train_step import TrainState, make_train_step, make_eval_step

__all__ = [
    "make_mesh",
    "param_shardings",
    "batch_sharding",
    "ProcessTrainShard",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
