"""Alias entrypoint mirroring the reference's `ssgan_inference_moving_mnist.py`."""
from graphical_gan_tpu.runs.ssgan import main as _main


def main(argv=None):
    _main(["--dataset", "moving_mnist"] + (argv or __import__("sys").argv[1:]))


if __name__ == "__main__":
    main()
