"""Alias entrypoint mirroring the reference's `gan_inference_cifar10.py`.

    python -m graphical_gan_tpu.runs.gan_inference_cifar10 --mode ali
"""
from graphical_gan_tpu.runs.gan_inference import main as _main


def main(argv=None):
    _main(["--dataset", "cifar10"] + (argv or __import__("sys").argv[1:]))


if __name__ == "__main__":
    main()
