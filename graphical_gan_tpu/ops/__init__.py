from graphical_gan_tpu.ops.activations import leaky_relu, relu, dropout, gaussian_noise
from graphical_gan_tpu.ops.linear import linear
from graphical_gan_tpu.ops.conv import conv2d, deconv2d, conv1d, conv3d
from graphical_gan_tpu.ops.norm import batchnorm, layernorm, cond_batchnorm
from graphical_gan_tpu.ops.special import minibatch_layer, ladder
from graphical_gan_tpu.ops.layout import flatten_image, unflatten_image
