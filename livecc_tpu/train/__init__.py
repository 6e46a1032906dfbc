from livecc_tpu.train.step import Batch, TrainConfig, loss_fn, lr_schedule, make_optimizer, make_train_step, split_frozen

__all__ = ["Batch", "TrainConfig", "loss_fn", "lr_schedule", "make_optimizer", "make_train_step", "split_frozen"]
