from ns2vc_tpu.train.trainer import Trainer, TrainState, make_train_step

__all__ = ["Trainer", "TrainState", "make_train_step"]
