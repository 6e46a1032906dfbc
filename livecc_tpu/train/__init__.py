from livecc_tpu.train.step import Batch, TrainConfig, loss_fn, lr_schedule, make_optimizer, make_train_step

__all__ = ["Batch", "TrainConfig", "loss_fn", "lr_schedule", "make_optimizer", "make_train_step"]
