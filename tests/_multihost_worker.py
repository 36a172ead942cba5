"""Worker for the 2-process multi-host input test (see test_multihost.py).

Each process owns 4 virtual CPU devices of an 8-device 'data' mesh, feeds
ONLY its local half of the global batch through
``parallel.input.host_local_batches``, and runs one DP train step.  Usage:

    python tests/_multihost_worker.py <coordinator> <process_id> [single]

``single`` mode runs the same global batch on one process with all 8
devices (the equivalence oracle).  Prints one JSON line with the metrics.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    coordinator, pid, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax

    if mode == "multi":
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=2, process_id=pid)
    import jax.numpy as jnp

    from graphical_gan_tpu.core.config import gan_inference_defaults
    from graphical_gan_tpu.models.gan_inference import GanInferenceModel
    from graphical_gan_tpu.parallel.input import host_local_batches
    from graphical_gan_tpu.parallel.mesh import (
        make_mesh, make_parallel_train_step, shard_batch)

    assert jax.device_count() == 8, jax.devices()
    if mode == "multi":
        assert len(jax.local_devices()) == 4
        assert jax.process_index() == pid

    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=16)
    model = GanInferenceModel(cfg)
    k = cfg.critic_iters

    # the SAME deterministic global batch in both modes
    rng = np.random.RandomState(0)
    global_raw = rng.rand(1 + k, cfg.batch_size, 784).astype(np.float32)

    mesh = make_mesh(8)
    step, init_state, place = make_parallel_train_step(model, mesh)
    state = place(init_state(model.init(jax.random.PRNGKey(0))))

    if mode == "multi":
        # this process feeds only its half of the batch axis
        half = cfg.batch_size // 2
        local = global_raw[:, pid * half:(pid + 1) * half]
        raw = host_local_batches(mesh, local)
        assert raw.shape == global_raw.shape  # global logical shape
        assert not raw.sharding.is_fully_replicated
    else:
        raw = shard_batch(mesh, jnp.asarray(global_raw))

    state, metrics = step(state, raw, jax.random.PRNGKey(1),
                          jnp.asarray(True))
    out = {"mode": mode, "pid": pid,
           "gen_cost": float(metrics["gen_cost"]),
           "disc_cost": float(metrics["disc_cost"])}

    if mode == "multi" and len(sys.argv) > 4:
        # 2-process orbax checkpoint: every process calls save() (orbax
        # coordinates the shard writes; extra json written by process 0),
        # then restores into the placed structure and checks a param leaf
        # round-tripped and kept its sharding
        from graphical_gan_tpu.train import checkpoint
        path = sys.argv[4]
        assert checkpoint.is_orbax(path)
        checkpoint.save(path, state, extra={"iteration": 1})
        restored, extra = checkpoint.restore(path, state)
        assert extra == {"iteration": 1}
        name = next(iter(state.params))
        np.testing.assert_array_equal(np.asarray(restored.params[name]),
                                      np.asarray(state.params[name]))
        out["orbax_ok"] = True
        out["orbax_extra_iteration"] = extra["iteration"]

    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
