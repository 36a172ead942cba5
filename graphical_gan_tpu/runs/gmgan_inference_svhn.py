"""Alias entrypoint mirroring the reference's `gmgan_inference_svhn.py`."""
from graphical_gan_tpu.runs.gmgan import main as _main


def main(argv=None):
    _main(["--dataset", "svhn"] + (argv or __import__("sys").argv[1:]))


if __name__ == "__main__":
    main()
