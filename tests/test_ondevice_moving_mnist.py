"""On-device moving-MNIST synthesis (data/ondevice_moving_mnist.py):
trajectory law, paste parity with the host synthesizer, sampler pairing,
and trainer integration through the batch_sampler hook."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphical_gan_tpu.data import moving_mnist as host_mm
from graphical_gan_tpu.data import ondevice_moving_mnist as dev_mm


def test_trajectory_law_bounds_and_speed():
    top, left = dev_mm.random_trajectory(jax.random.PRNGKey(0), 64, 16)
    top, left = np.asarray(top), np.asarray(left)
    assert top.shape == (16, 64) and left.shape == (16, 64)
    canvas = dev_mm.IMAGE_SIZE - dev_mm.DIGIT_SIZE
    assert top.min() >= 0 and top.max() <= canvas
    assert left.min() >= 0 and left.max() <= canvas
    # constant speed 0.1 in [0,1] units => per-step pixel displacement is
    # bounded by canvas*0.1 (+1 for the int cast) on each axis
    step = canvas * dev_mm.STEP_LENGTH + 1
    assert np.abs(np.diff(top, axis=0)).max() <= step
    assert np.abs(np.diff(left, axis=0)).max() <= step
    # and the digit actually moves
    assert np.abs(np.diff(top, axis=0)).mean() > 0.5


def test_paste_matches_host_synthesizer():
    """jax paste == the host (numpy) paste on identical trajectories; the
    host synthesizer regenerates its trajectory from the seeded rng, so a
    fresh rng with the same seed reproduces it for the jax side."""
    rng = np.random.RandomState(7)
    digits = np.random.RandomState(1).rand(5, 28, 28).astype(np.float32)
    expected = host_mm.synthesize_batch(rng, digits, 6)

    top, left = host_mm.random_trajectory(np.random.RandomState(7), 5, 6)
    got = np.asarray(dev_mm.paste_digits(jnp.asarray(digits),
                                         jnp.asarray(top),
                                         jnp.asarray(left)))
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-6)


def test_paste_conserves_digit_mass():
    """No clipping at the walls: every frame contains the whole digit."""
    digits = np.random.RandomState(2).rand(8, 28, 28).astype(np.float32)
    videos = np.asarray(dev_mm.synthesize_videos(
        jnp.asarray(digits), jax.random.PRNGKey(3), 10))
    frame_sums = videos.sum(axis=2)                       # [B, L]
    # f32 summation order differs between the 64x64 frame and the 28x28
    # digit, hence the loose tolerance
    expected = np.broadcast_to(digits.sum(axis=(1, 2))[:, None],
                               frame_sums.shape)
    np.testing.assert_allclose(frame_sums, expected, rtol=1e-4)


def test_video_sampler_pairs_digits_with_labels():
    """Class-coded constant digits: the video's max pixel identifies the
    class, which must match the sampled one-hot label."""
    n_c = 10
    pool = np.stack([np.full((28, 28), (i % n_c + 1) / 10.0, np.float32)
                     for i in range(40)])
    labels = np.eye(n_c, dtype=np.float32)[np.arange(40) % n_c]
    sampler = dev_mm.make_video_sampler(seq_length=4)
    out = sampler({"digits": jnp.asarray(pool), "labels": jnp.asarray(labels)},
                  jax.random.PRNGKey(0), n=2, batch_size=6)
    x, y = np.asarray(out["x"]), np.asarray(out["y"])
    assert x.shape == (2, 6, 4, 64 * 64) and y.shape == (2, 6, n_c)
    cls_from_pixels = np.round(x.max(axis=(2, 3)) * 10).astype(int) - 1
    np.testing.assert_array_equal(cls_from_pixels, y.argmax(axis=2))


@pytest.mark.slow
def test_trainer_device_synthesis_pipeline(tmp_path):
    """End-to-end: ssgan trains through data_pipeline='device' (on-device
    synthesis inside the compiled chunk), losses finite, cadences fire."""
    from graphical_gan_tpu.runs import ssgan

    trainer, last = ssgan.run(
        "moving_mnist", "local_ep", iters=4, outdir=str(tmp_path),
        seed=0, eval_every=3, checkpoint_every=3, data_pipeline="device",
        chunk_size=2, dim=8, dim_op=16, batch_size=4, seq_len=4)
    assert all(np.isfinite(v) for v in last.values())
    assert trainer.batch_sampler is not None
    assert int(trainer.state.step) == 4  # one step per training iteration
