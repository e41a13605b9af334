"""JAX platform selection helper.

Some environments pre-register a remote TPU PJRT plugin from
``sitecustomize`` and force ``jax_platforms`` to it at interpreter start —
after which the JAX_PLATFORMS *environment variable* is silently ignored.
Calling :func:`honor_platform_env` early (before any computation) restores
the expected env-var semantics for the CLI tools; an explicit ``platform``
argument wins over the env.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["honor_platform_env"]


def honor_platform_env(platform: Optional[str] = None) -> None:
    choice = platform or os.environ.get("JAX_PLATFORMS")
    if choice:
        import jax
        jax.config.update("jax_platforms", choice)
