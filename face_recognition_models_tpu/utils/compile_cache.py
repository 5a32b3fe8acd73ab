"""Persistent XLA compilation cache.

The reference has no compile step to amortize (eager torch); under XLA
every program compiles on first use (20-300 s for the big train steps
through this sandbox's tunnel). For production serving and repeated
eval/train launches that cost dominates cold start, so `face
--compile-cache DIR <cmd>` persists compiled executables across
processes: the second launch of the same program deserializes from DIR
instead of recompiling. Backed by jax's persistent compilation cache
(works on TPU; CPU builds may ignore it).
"""

from __future__ import annotations

import os


def enable_compilation_cache(directory: str,
                             min_compile_time_secs: float = 0.5) -> None:
    """Turn on the persistent compilation cache rooted at `directory`.

    min_compile_time_secs: only programs costlier than this are written
    (tiny programs recompile faster than they deserialize). Call before
    the first jit execution; later calls are harmless.
    """
    import jax

    directory = os.path.abspath(os.path.expanduser(directory))
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # cache every program above the time threshold regardless of size
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
