from vqwild_tpu.train.step import TrainState, make_optimizer, make_train_step
from vqwild_tpu.train.loop import TrainLoop

__all__ = ["TrainState", "make_optimizer", "make_train_step", "TrainLoop"]
