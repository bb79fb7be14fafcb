"""jax.jit with per-program TPU compiler options.

TPU compiler flags cannot ride the XLA_FLAGS env var in client/server
TPU setups (e.g. tunnel-attached chips): XLA_FLAGS is parsed by the
CLIENT-side XLA build, which hard-aborts on ``xla_tpu_*`` names that
only exist in the server-side TPU compiler.  The portable route is
PJRT CompileOptions — ``jit(fn).lower(args).compile(compiler_options)``
— which scopes the flags to one program instead of the whole process.

``serving_jit`` wraps that dance behind the plain-jit calling
convention: per-input-shape AOT compile cache (the serving pipeline is
re-entered with several power-of-two batch buckets), falling back to
``jax.jit`` exactly when no options apply.  Options resolve from, in
priority order, the explicit ``options`` argument and the
``IPE_COMPILER_OPTIONS`` env var (a JSON dict of flag name -> value).

The serving default is empty: the measured A/B on one v5e
(tools/probe_xla_flags, BENCH.md) drives which options, if any, are
worth turning on per deployment.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax

__all__ = ["serving_jit", "resolve_options"]


def resolve_options(options: Optional[Dict[str, str]] = None
                    ) -> Dict[str, str]:
    """Merge the env override into the caller's options (env wins)."""
    merged = dict(options or {})
    env = os.environ.get("IPE_COMPILER_OPTIONS", "")
    if env:
        merged.update(json.loads(env))
    return merged


class _ShapeCachedCompile:
    """Callable with jit-like behavior: one AOT compile per input
    shape/dtype signature, carrying PJRT compiler options."""

    def __init__(self, fn: Callable, options: Dict[str, str],
                 donate_argnums=()):
        self._jit = jax.jit(fn, donate_argnums=donate_argnums)
        self._options = dict(options)
        self._compiled: dict = {}

    def _key(self, args):
        leaves = jax.tree_util.tree_leaves(args)
        return tuple((getattr(a, "shape", None), str(getattr(a, "dtype", "")))
                     for a in leaves)

    def __call__(self, *args):
        key = self._key(args)
        compiled = self._compiled.get(key)
        if compiled is None:
            compiled = self._jit.lower(*args).compile(
                compiler_options=self._options)
            self._compiled[key] = compiled
        return compiled(*args)

    # parity with jax.jit's introspection hook (used by tests)
    def _cache_size(self) -> int:
        return len(self._compiled)


def serving_jit(fn: Callable,
                options: Optional[Dict[str, str]] = None,
                donate_argnums=()) -> Callable:
    """``jax.jit(fn)``, optionally compiled with TPU compiler options.

    With no options (after env merging) this IS ``jax.jit(fn)`` — same
    tracing, donation, and persistent-cache behavior. With options it
    returns a per-shape AOT-compiling wrapper that ships them via
    CompileOptions.  ``donate_argnums`` forwards to jax.jit in both
    paths (streaming serving donates the input crop buffer: each batch
    array is consumed exactly once, so XLA may reuse its HBM for the
    activations instead of allocating alongside it).
    """
    merged = resolve_options(options)
    if not merged:
        return jax.jit(fn, donate_argnums=donate_argnums)
    return _ShapeCachedCompile(fn, merged, donate_argnums)
