from graphical_gan_tpu.objectives import (
    gan_inference,
    gan,
    mmd,
    kl,
    kl_aggregated,
    discrete,
    penalties,
)
from graphical_gan_tpu.objectives.common import sigmoid_ce, OptSpec, optimizer_for
