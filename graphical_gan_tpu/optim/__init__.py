from graphical_gan_tpu.optim.optimizers import (
    Optimizer,
    adam,
    rmsprop,
    make_optimizer,
    clip_params,
)
