from graphical_gan_tpu.report.save_images import save_images, save_gifs, large_image
from graphical_gan_tpu.report.plot import MetricLogger
