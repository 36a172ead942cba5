from graphical_gan_tpu.serve.export import (
    export_sampler,
    load_sampler,
    make_sampler,
)
