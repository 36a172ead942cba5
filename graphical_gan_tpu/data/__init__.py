from graphical_gan_tpu.data import (
    mnist, cifar10, svhn, celeba, chairs, moving_mnist, ondevice, synthetic,
)
