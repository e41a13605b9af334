"""GPipe pipeline parallelism (parallel/pipeline.py) vs sequential layer
application on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ant_quantization_tpu.parallel.pipeline import gpipe, shard_stage_params


def _mesh(pp):
    devs = np.asarray(jax.devices("cpu")[:pp])
    return Mesh(devs, ("pp",))


def _stack(L, d, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.normal(size=(L, d, d)) / np.sqrt(d),
                         jnp.float32),
        "b": jnp.asarray(rng.normal(size=(L, d)) * 0.1, jnp.float32),
    }


def _sequential(params, x):
    def layer(h, p):
        return jnp.tanh(h @ p["w"] + p["b"]), ()
    y, _ = jax.lax.scan(layer, x, params)
    return y


def _stage_fn(stage_params, x):
    # apply this stage's local layer shard sequentially
    return _sequential(stage_params, x)


@pytest.mark.parametrize("pp,M", [(2, 4), (4, 8), (4, 3)])
def test_gpipe_matches_sequential(pp, M):
    L, d, mb = 8, 16, 4
    params = _stack(L, d)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(M, mb, d)),
                    jnp.float32)
    want = jax.vmap(lambda xi: _sequential(params, xi))(x)

    mesh = _mesh(pp)
    ps = shard_stage_params(params, mesh)
    apply = gpipe(_stage_fn, mesh)
    got = apply(ps, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_single_stage_degenerates():
    L, d = 4, 8
    params = _stack(L, d)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3, d)),
                    jnp.float32)
    mesh = _mesh(1)
    got = gpipe(_stage_fn, mesh)(shard_stage_params(params, mesh), x)
    want = jax.vmap(lambda xi: _sequential(params, xi))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
