"""Native (C++) host-runtime components.

The TPU compute path is JAX/XLA; the host side around it — audio decode,
random-access cropping, batched threaded IO — is implemented in C++
(wavio.cpp) and loaded through ctypes. Everything degrades gracefully: if no
C++ toolchain is available the pure-Python scipy path is used instead, so
the framework never hard-depends on the native build.
"""

from .wavio import (  # noqa: F401
    native_available,
    read_batch,
    wav_info,
    wav_read,
    wav_write,
)
