"""Sequence-parallel (data x seq) mesh for the video family: the frame axis
is genuinely shardable (SURVEY §5 "keep the scan axis shardable") — the
compiled step partitions the folded B*LEN frame networks over BOTH mesh axes
and matches the unsharded program numerically."""

import re

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from graphical_gan_tpu.core.config import ssgan_defaults
from graphical_gan_tpu.models.ssgan import SSGanModel
from graphical_gan_tpu.parallel.sequence import make_sp_train_step
from graphical_gan_tpu.train.step import make_train_step

KEY = jax.random.PRNGKey(0)


def make_mesh_sp(data=2, seq=4):
    devs = np.asarray(jax.devices()[:data * seq]).reshape(data, seq)
    return Mesh(devs, ("data", "seq"))


def _forward_conv_batches(hlo_text):
    """Leading (batch) dims of the DATA convolutions in the HLO.

    Data convs are the stride-2 forward convs and the lhs-dilated
    deconv/grad-input forms; filter-gradient convs also print with b01f
    labels but put input channels in the batch slot (window has
    ``rhs_dilate`` and the output is filter-shaped), so exclude them.
    """
    out = []
    for ln in hlo_text.splitlines():
        if "convolution(" not in ln or "b01f_01io->b01f" not in ln:
            continue
        if "stride=2x2" not in ln and "lhs_dilate=2x2" not in ln:
            continue
        m = re.search(r"= \w+\[(\d+),", ln)
        if m:
            out.append(int(m.group(1)))
    return out


@pytest.mark.slow
def test_sp_step_partitions_frames_and_matches_unsharded():
    model = SSGanModel(ssgan_defaults("moving_mnist", "local_ep", dim=16,
                                      dim_op=64, batch_size=8, seq_len=4))
    cfg = model.cfg
    rng = np.random.RandomState(0)
    raw_np = {
        "x": rng.rand(2, cfg.batch_size, cfg.seq_len,
                      cfg.output_dim).astype("float32"),
        "y": np.eye(cfg.n_classes, dtype=np.float32)[
            rng.randint(0, cfg.n_classes, size=(2, cfg.batch_size))],
    }
    key = jax.random.PRNGKey(3)

    step1, init1 = make_train_step(model, donate=False)
    s1, m1 = step1(init1(model.init(KEY)),
                   jax.tree.map(jnp.asarray, raw_np), key, jnp.asarray(True))

    mesh = make_mesh_sp(data=2, seq=4)
    stepN, initN, place = make_sp_train_step(model, mesh, donate=False)
    state = place(initN(model.init(KEY)))
    raw = jax.tree.map(jnp.asarray, raw_np)

    lowered = stepN.lower(state, raw, key, jnp.asarray(True))
    compiled = lowered.compile()
    batches = _forward_conv_batches(compiled.as_text())
    assert batches, "expected forward convolutions in the compiled step"
    # full frame batch B*LEN = 32; an 8-way (data x seq) partition leaves 4
    # frames per device.  g_extractor's video-as-channels convs run at the
    # data-sharded video batch (8/2 = 4) as well.  Anything larger means a
    # frame network escaped the partition (e.g. the generator-side fold,
    # whose inputs descend from replicated RNG, not from the sharded data).
    local = (cfg.batch_size * cfg.seq_len) // mesh.devices.size
    assert max(batches) <= local, batches

    sN, mN = stepN(state, raw, key, jnp.asarray(True))

    np.testing.assert_allclose(float(m1["gen_cost"]), float(mN["gen_cost"]),
                               rtol=5e-4)
    np.testing.assert_allclose(float(m1["disc_cost"]),
                               float(mN["disc_cost"]), rtol=5e-4)
    for n in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[n]), np.asarray(sN.params[n]),
            atol=3e-4, err_msg=n)


def test_sp_multi_step_unconditional():
    """Chairs-style unconditional videos under a seq-majority mesh (1 x 4):
    LEN shards even when B does not divide the device count."""
    model = SSGanModel(ssgan_defaults("chairs", "local_ep", dim=8, dim_op=16,
                                      batch_size=3, seq_len=4))
    cfg = model.cfg
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "seq"))
    step, init_state, place = make_sp_train_step(model, mesh)
    state = place(init_state(model.init(KEY)))
    rng = np.random.RandomState(1)
    for i in range(2):
        raw = {"x": jnp.asarray(rng.rand(
            2, cfg.batch_size, cfg.seq_len,
            cfg.output_dim).astype("float32"))}
        state, m = step(state, raw, jax.random.PRNGKey(i), jnp.asarray(True))
    assert np.isfinite(float(m["gen_cost"]))
    assert np.isfinite(float(m["disc_cost"]))
