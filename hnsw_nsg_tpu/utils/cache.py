"""Persistent XLA compilation cache setup.

The framework's jitted kernels (beam search, pruner, nn-descent iteration)
compile once per shape bucket; on environments where compilation is remote
(or simply slow), enabling JAX's persistent cache makes those compiles a
one-time cost across processes. Call once at startup, before the first jit
execution.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(path: str | None = None) -> str:
    path = path or os.environ.get("HNSW_NSG_TPU_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
