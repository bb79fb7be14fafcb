"""serving_jit: per-program compiler options behind the jit convention."""

import numpy as np

import jax
import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu.ops.jitopt import (
    resolve_options,
    serving_jit,
)


def _f(x, y):
    return jnp.tanh(x @ y).sum(axis=-1)


def test_no_options_is_plain_jit():
    fn = serving_jit(_f)
    assert isinstance(fn, type(jax.jit(_f)))


def test_options_path_matches_plain_jit_per_shape():
    # xla_embed_ir_in_executable is accepted by every backend and
    # doesn't change numerics, so this exercises the AOT compile path
    # without depending on TPU-only flag names.
    opt = serving_jit(_f, options={"xla_embed_ir_in_executable": "False"})
    assert opt._cache_size() == 0
    rng = np.random.RandomState(0)
    for shape in ((4, 8), (2, 8)):
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        y = jnp.asarray(rng.randn(8, 8).astype(np.float32))
        np.testing.assert_allclose(np.asarray(opt(x, y)),
                                   np.asarray(jax.jit(_f)(x, y)),
                                   rtol=1e-6)
    assert opt._cache_size() == 2  # one program per input signature
    # same shapes again: cache hit, no growth
    x = jnp.zeros((4, 8), jnp.float32)
    y = jnp.zeros((8, 8), jnp.float32)
    opt(x, y)
    assert opt._cache_size() == 2


def test_env_merge(monkeypatch):
    monkeypatch.setenv("IPE_COMPILER_OPTIONS", '{"a": "1", "b": "2"}')
    assert resolve_options({"b": "x", "c": "3"}) == {
        "a": "1", "b": "2", "c": "3"}  # env wins on conflicts
    monkeypatch.delenv("IPE_COMPILER_OPTIONS")
    assert resolve_options(None) == {}
