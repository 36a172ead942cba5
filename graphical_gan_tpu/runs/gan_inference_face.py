"""Alias entrypoint mirroring the reference's `gan_inference_face.py`
(CelebA 64x64, ali only).

    python -m graphical_gan_tpu.runs.gan_inference_face
"""
from graphical_gan_tpu.runs.gan_inference import main as _main


def main(argv=None):
    _main(["--dataset", "celeba"] + (argv or __import__("sys").argv[1:]))


if __name__ == "__main__":
    main()
