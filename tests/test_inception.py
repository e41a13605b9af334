"""InceptionV3: shapes, importer key coverage (synthetic state dict)."""

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.models.inception import (InceptionV3,
                                                   import_torchvision_inception,
                                                   inception_v3_config)
from ant_quantization_tpu.nn.config import QuantConfig

FP = QuantConfig(enabled=False)


def test_inception_param_count_and_shape():
    m = InceptionV3(inception_v3_config(), FP)
    x = jnp.zeros((1, 299, 299, 3))
    variables = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    # torchvision inception_v3 aux_logits=False: 23.8M params
    assert n == 23_834_568, n
    y = jax.eval_shape(m.apply, variables, x)
    assert y.shape == (1, 1000)


def test_inception_importer_roundtrip():
    """Build a fake torchvision state dict from our own abstract tree and
    check the importer covers every param with matching shapes."""
    cfg = inception_v3_config()
    m = InceptionV3(cfg, FP)
    x = jnp.zeros((1, 299, 299, 3))
    variables = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)

    sd = {}

    def walk(node, prefix):
        if "conv" in node and "bn" in node:
            k = node["conv"]["kernel"].shape  # (kh, kw, i, o)
            sd[f"{prefix}.conv.weight"] = np.zeros(
                (k[3], k[2], k[0], k[1]), np.float32)
            c = k[3]
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.bn.{suffix}"] = np.zeros(c, np.float32)
            return
        for key, sub in node.items():
            if isinstance(sub, dict):
                walk(sub, f"{prefix}.{key}" if prefix else key)

    walk(variables["params"], "")
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)

    params, stats = import_torchvision_inception(sd, cfg)

    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape,
                                        variables["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, params)
    assert ref_shapes == got_shapes
    ref_stats = jax.tree_util.tree_map(lambda a: a.shape,
                                       variables["batch_stats"])
    got_stats = jax.tree_util.tree_map(np.shape, stats)
    assert ref_stats == got_stats
