"""reze-tpu: a TPU-native, fully batched MMD simulate+render engine.

Public surface mirrors the reference engine's exports
(/root/reference/engine/src/index.ts: Engine, EngineStats, Vec3, Quat, Mat4)
with the math types served by the functional `core.math3d` module.
"""

import os as _os

# Persistent compilation cache: Mosaic/XLA compiles through this sandbox's
# remote helper are slow (minutes); caching makes second runs instant.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache = _os.path.expanduser("~/.cache/jax_comp")
    try:
        _os.makedirs(_cache, exist_ok=True)
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .camera import Camera  # noqa: E402,F401
from .core import math3d  # noqa: E402,F401
from .core.types import EngineConfig  # noqa: E402,F401
from .engine import Engine, EngineStats  # noqa: E402,F401

__all__ = ["Engine", "EngineStats", "EngineConfig", "Camera", "math3d"]
__version__ = "0.1.0"
