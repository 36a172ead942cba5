"""Generate-from-checkpoint CLI (tools/generate.py).

The reference saves a final checkpoint but ships no restore path
(``gan_inference_cifar10.py:415,498-499``) — this tool is the rebuild's
inference-time reuse surface, so pin: config.json round-trips into the
right family config, the latest checkpoint restores, and the family's
artifact set appears.  Also regression-covers trainer cadence hardening
(eval_every=0 / checkpoint_every=0 must disable, not divide by zero).
"""

import glob
import os

import numpy as np
import pytest

from graphical_gan_tpu.tools.generate import detect_family, generate


def test_detect_family():
    assert detect_family({"mode": "ali", "dim": 64}) == "gan_inference"
    assert detect_family({"mode_k": "CONCRETE", "n_coms": 30}) == "gmgan"
    assert detect_family({"pos_mode": "gsp", "seq_len": 16}) == "ssgan"


def _tiny_family1_run(tmp_path, **kw):
    from graphical_gan_tpu.runs.gan_inference import run
    trainer, _ = run("mnist", "ali", iters=2, outdir=str(tmp_path),
                     dim=8, batch_size=8, checkpoint_every=2,
                     sample_every=1000, tsne_every=0, **kw)
    return trainer.outf


@pytest.mark.slow
def test_generate_family1(tmp_path):
    outf = _tiny_family1_run(tmp_path)
    info = generate(outf)
    assert info["family"] == "gan_inference"
    assert info["iteration"] == 1
    names = info["artifacts"]
    assert any("samples" in n for n in names)
    assert any("reconstruction" in n for n in names)
    for n in names:  # grids decode
        from PIL import Image
        Image.open(os.path.join(info["outdir"], n)).verify()


def test_generate_no_data_skips_reconstruction(tmp_path):
    outf = _tiny_family1_run(tmp_path)
    info = generate(outf, with_data=False)
    assert any("samples" in n for n in info["artifacts"])
    assert not any("reconstruction" in n for n in info["artifacts"])


@pytest.mark.slow
def test_trainer_zero_cadences_disable(tmp_path):
    # eval_every=0 / checkpoint_every=0 mean "off": the run completes and
    # only the final-iteration checkpoint is written
    from graphical_gan_tpu.runs.gmgan import run
    trainer, _ = run("mnist", "local_ep", iters=3, outdir=str(tmp_path),
                     dim=8, batch_size=8, n_coms=4, n_vis=8,
                     checkpoint_every=0, eval_every=0)
    ckpts = glob.glob(os.path.join(trainer.outf, "ckpt_*.npz"))
    assert [os.path.basename(c) for c in ckpts] == ["ckpt_2.npz"]


@pytest.mark.slow
def test_generate_gmgan_and_ssgan(tmp_path):
    from graphical_gan_tpu.runs import gmgan, ssgan
    tr, _ = gmgan.run("mnist", "local_ep", iters=2, outdir=str(tmp_path),
                      dim=8, batch_size=8, n_coms=4, n_vis=8,
                      checkpoint_every=2, eval_every=1000)
    info = generate(tr.outf)
    assert info["family"] == "gmgan"
    assert any("samples" in n for n in info["artifacts"])

    tr, _ = ssgan.run("moving_mnist", "local_ep", iters=2,
                      outdir=str(tmp_path), dim=8, batch_size=4, seq_len=4,
                      dim_op=16, dim_latent_g=8, dim_latent_l=4, n_vis=4,
                      checkpoint_every=2, eval_every=1000)
    info = generate(tr.outf)
    assert info["family"] == "ssgan"
    assert any(n.endswith(".gif") for n in info["artifacts"])
    assert any("disentangle" in n for n in info["artifacts"])


@pytest.mark.slow
def test_generate_from_pp_checkpoint(tmp_path):
    """A pipeline-parallel run's checkpoint (packed per-stage rows) restores
    through the same generate path: restore_params detects the pp layout
    and unpacks the name-keyed params."""
    outf = _tiny_family1_run(tmp_path, parallel="pp")
    info = generate(outf)
    assert info["family"] == "gan_inference"
    assert any("samples" in n for n in info["artifacts"])
