from graphical_gan_tpu.core import registry, rng, config
