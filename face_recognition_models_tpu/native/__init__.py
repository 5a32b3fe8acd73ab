"""Native (C++) runtime components, bound via ctypes.

`fastdecode`: threaded batch JPEG decode + resize straight into a
preallocated uint8 batch buffer (libjpeg/-turbo). Built lazily on first use
with g++ and cached next to the source; environments without a compiler or
libjpeg fall back to the PIL path automatically (data/pipeline.py).
"""

from face_recognition_models_tpu.native.fastdecode import (
    decode_batch,
    decode_batch_mem,
    is_available,
)

__all__ = ["decode_batch", "decode_batch_mem", "is_available"]
