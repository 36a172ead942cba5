"""Quality-instrument discrimination (VERDICT r2 item 4).

Round 2's hermetic IS saturated at its floor on structureless synthetic
data, making 'identical IS' vacuous.  These tests pin the fixed instrument:
on the LEARNABLE structured family the classifier separates classes, and
the IS/FID pipeline spreads a wide gap between real data and broken
(noise) samples — so a generator score now carries information.
"""

import numpy as np
import pytest

from graphical_gan_tpu.data.synthetic import structured_images_labeled
from graphical_gan_tpu.metrics.fid import frechet_distance, gaussian_stats
from graphical_gan_tpu.metrics.inception import get_inception_score
from graphical_gan_tpu.metrics.jax_classifier import MetricClassifier


def _to_hwc(flat_int, c, h, w):
    x = np.asarray(flat_int).reshape(-1, c, h, w)
    return x.transpose(0, 2, 3, 1).astype(np.float64)


@pytest.mark.slow
def test_structured_family_instruments_are_discriminating():
    h = w = 28
    flat, labels = structured_images_labeled(3000, (h, w), 1, 4, seed=0)
    train_flat, train_y = flat[:2500], labels[:2500]
    held_flat, held_y = flat[2500:], labels[2500:]

    clf = MetricClassifier(image_hw=(h, w), channels=1, n_classes=4, dim=16)
    params = clf.fit(train_flat, train_y, steps=300, batch_size=128)
    acc = clf.accuracy(params, held_flat, held_y)
    assert acc > 0.9, acc  # chance = 0.25 — the instrument's validity check

    feature_fn = clf.as_feature_fn(params)
    prob_fn = clf.as_prob_fn(params)

    real_hwc = _to_hwc(train_flat[:1500], 1, h, w)
    held_hwc = _to_hwc(held_flat, 1, h, w)
    noise_hwc = np.random.RandomState(9).rand(500, h, w, 1) * 255.0

    mu_r, sig_r = gaussian_stats(feature_fn(real_hwc))

    is_held, _ = get_inception_score(list(held_hwc), prob_fn, splits=5)
    is_noise, _ = get_inception_score(list(noise_hwc), prob_fn, splits=5)
    # real data scores near the class count; noise near the floor
    assert is_held > 2.5, is_held
    assert is_noise < is_held / 1.5, (is_noise, is_held)

    mu_h, sig_h = gaussian_stats(feature_fn(held_hwc))
    mu_n, sig_n = gaussian_stats(feature_fn(noise_hwc))
    fid_held = frechet_distance(mu_r, sig_r, mu_h, sig_h)
    fid_noise = frechet_distance(mu_r, sig_r, mu_n, sig_n)
    # a broken generator (noise) scores FAR from the real anchor
    assert fid_noise > 5 * max(fid_held, 1e-3), (fid_noise, fid_held)
    assert fid_held < 2.0, fid_held


@pytest.mark.slow
def test_sensitivity_main_quantize_final(tmp_path, capsys):
    """--quantize-final scores the final checkpoint through the int8
    serving path with the same instrument (machinery test at tiny dims;
    the real v5e numbers live in BASELINE.md)."""
    import json
    from graphical_gan_tpu.tools.sensitivity import main

    out = str(tmp_path / "sens.json")
    main(["--dim", "8", "--batch-size", "8", "--n-data", "512",
          "--n-score", "64", "--checkpoints", "0,3", "--clf-steps", "30",
          "--clf-dim", "8", "--compute-dtype", "float32",
          "--quantize-final", "--out", out])
    with open(out) as f:
        rec = json.loads(f.read())
    assert rec["final_int8"]["iter"] == 3
    for k in ("is_mean", "fid"):
        assert np.isfinite(rec["final_int8"][k]), rec["final_int8"]
    # the int8 draw really went through quantization: scores exist for
    # the same iter as the float curve's last point
    assert rec["curve"][-1]["iter"] == 3
