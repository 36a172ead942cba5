from graphical_gan_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_parallel_train_step,
)
from graphical_gan_tpu.parallel.sharding_rules import (
    make_tp_train_step,
    tp_param_shardings,
)
