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
from graphical_gan_tpu.parallel.sequence import (
    make_sp_train_step,
    video_batch_spec,
)
from graphical_gan_tpu.parallel.composed import make_composed_train_step
from graphical_gan_tpu.parallel.expert import (
    make_ep_train_step,
    ep_param_shardings,
)
from graphical_gan_tpu.parallel.pipeline import make_pp_train_step
