"""Native (C++) host-side components, loaded via ctypes.

Build happens lazily at first use with the system toolchain (g++); the
shared object is cached next to the sources.  Everything here has a pure
Python/numpy fallback — the native path is a performance fast-path, not a
hard dependency.
"""

from graphical_gan_tpu.native.build import load_library, native_available
from graphical_gan_tpu.native.moving_mnist_ext import (
    synthesize_batch_native,
)
from graphical_gan_tpu.native.batcher_ext import (
    gather_rows_native,
    take_rows,
)
