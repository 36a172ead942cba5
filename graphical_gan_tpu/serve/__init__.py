from graphical_gan_tpu.serve.export import (
    ENTRIES,
    export_sampler,
    load_sampler,
    make_entry,
    make_sampler,
)
