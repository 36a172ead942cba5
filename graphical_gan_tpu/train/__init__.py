from graphical_gan_tpu.train.step import TrainState, make_train_step
from graphical_gan_tpu.train import checkpoint
