"""CNN/ViT model zoo: shapes, importer key coverage, quantized forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.models.cnn import (AlexNet, VGG16,
                                             import_torchvision_alexnet,
                                             import_torchvision_vgg16)
from ant_quantization_tpu.models.resnet import (ResNet, resnet18_config,
                                                resnet50_config,
                                                import_torchvision_resnet)
from ant_quantization_tpu.models.vit import ViT, vit_b_16_config
from ant_quantization_tpu.nn.config import QuantConfig

FP = QuantConfig(enabled=False)
FAST_Q = QuantConfig(mode="ant-int-flint", w_low=100, w_up=101,
                     a_low=100, a_up=101)


def test_resnet18_shapes():
    m = ResNet(resnet18_config(), FP)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 1000)
    # 20 convs + 1 fc = 21 kernels (torchvision resnet18 layout)
    kernels = sum(1 for _ in jax.tree_util.tree_leaves(variables["params"]))
    n_conv = len([k for k in jax.tree_util.tree_leaves_with_path(
        variables["params"]) if "kernel" in str(k[0])])
    assert n_conv == 21


def test_resnet18_quantized_forward():
    m = ResNet(resnet18_config(), FAST_Q)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(1), x)
    y, upd = m.apply(variables, x, mutable=["quant"])
    assert y.shape == (2, 1000) and np.isfinite(np.asarray(y)).all()
    y2 = m.apply({"params": variables["params"],
                  "batch_stats": variables["batch_stats"],
                  "quant": upd["quant"]}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5)


def test_resnet50_param_count():
    m = ResNet(resnet50_config(), FP)
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    nb = sum(p.size for p in
             jax.tree_util.tree_leaves(variables["batch_stats"]))
    # torchvision resnet50: 25.557M params total (incl. BN affine);
    # batch_stats (running mean/var) are tracked separately in flax
    assert n + nb == pytest.approx(25_557_032 + 53120, rel=0.01)


def test_resnet_importer_roundtrip():
    """Fake a torchvision state_dict with the right keys/shapes and ensure
    the importer fills every param."""
    cfg = resnet18_config()
    m = ResNet(cfg, FP)
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)

    sd = {}
    rng = np.random.default_rng(0)

    def fake_conv(key, shape):
        # flax kernel (kh, kw, i, o) -> torch (o, i, kh, kw)
        sd[key + ".weight"] = rng.normal(
            size=(shape[3], shape[2], shape[0], shape[1])).astype(np.float32)

    def fake_bn(key, n):
        for suffix, v in (("weight", 1.0), ("bias", 0.0),
                          ("running_mean", 0.0), ("running_var", 1.0)):
            sd[key + "." + suffix] = np.full(n, v, np.float32)

    def walk(params, stats, prefix_map):
        pass

    p = variables["params"]
    fake_conv("conv1", p["conv1"]["kernel"].shape)
    fake_bn("bn1", 64)
    for stage, blocks in enumerate(cfg.layers):
        for b in range(blocks):
            src = f"layer{stage+1}.{b}"
            dst = f"layer{stage+1}_{b}"
            node = p[dst]
            for ci in (1, 2):
                fake_conv(f"{src}.conv{ci}", node[f"conv{ci}"]["kernel"].shape)
                fake_bn(f"{src}.bn{ci}",
                        node[f"conv{ci}"]["kernel"].shape[-1])
            if "downsample_conv" in node:
                fake_conv(f"{src}.downsample.0",
                          node["downsample_conv"]["kernel"].shape)
                fake_bn(f"{src}.downsample.1",
                        node["downsample_conv"]["kernel"].shape[-1])
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)

    params, stats = import_torchvision_resnet(sd, cfg)
    got = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, params))
    # apply must accept the imported tree
    y = ResNet(cfg, FP).apply({"params": params, "batch_stats": stats}, x)
    assert y.shape == (1, 1000)


def test_vgg16_and_alexnet_shapes():
    # eval_shape: abstract init + forward, no FLOPs (224^2 CPU convs are
    # too slow for the suite; numerics are covered by the resnet tests)
    for cls, n_params in ((VGG16, 138_357_544), (AlexNet, 61_100_840)):
        m = cls(FP)
        x = jnp.zeros((1, 224, 224, 3))
        variables = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
        n = sum(p.size for p in
                jax.tree_util.tree_leaves(variables["params"]))
        assert n == n_params, (cls.__name__, n)
        y = jax.eval_shape(m.apply, variables, x)
        assert y.shape == (1, 1000)


def test_vit_b16_param_count():
    m = ViT(vit_b_16_config(), FP)
    x = jnp.zeros((1, 224, 224, 3))
    variables = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 86_567_656  # torchvision vit_b_16
    y = jax.eval_shape(m.apply, variables, x)
    assert y.shape == (1, 1000)


def test_vgg16_bn_variant():
    """vgg16_bn: BN after every conv (torchvision parameter count), and
    the torchvision vgg16_bn state-dict imports with batch stats."""
    import numpy as np
    m = VGG16(FP, with_bn=True)
    x = jnp.zeros((1, 224, 224, 3))
    variables = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 138_365_992          # torchvision vgg16_bn num params
    assert "batch_stats" in variables and "bn_0" in variables["batch_stats"]

    # synthetic torchvision vgg16_bn state dict
    from ant_quantization_tpu.models.cnn import (VGG16_LAYOUT,
                                                 _vgg_feature_indices)
    rng = np.random.default_rng(0)
    sd = {}
    chans = [c for c in VGG16_LAYOUT if c != "M"]
    in_c = 3
    for tv_i, oc in zip(_vgg_feature_indices(True), chans):
        sd[f"features.{tv_i}.weight"] = rng.normal(
            size=(oc, in_c, 3, 3)).astype(np.float32)
        sd[f"features.{tv_i}.bias"] = np.zeros(oc, np.float32)
        b = tv_i + 1
        sd[f"features.{b}.weight"] = np.ones(oc, np.float32)
        sd[f"features.{b}.bias"] = np.zeros(oc, np.float32)
        sd[f"features.{b}.running_mean"] = np.zeros(oc, np.float32)
        sd[f"features.{b}.running_var"] = np.ones(oc, np.float32)
        in_c = oc
    for i, (ni, no) in zip((0, 3, 6), ((25088, 4096), (4096, 4096),
                                       (4096, 1000))):
        sd[f"classifier.{i}.weight"] = rng.normal(
            size=(no, ni)).astype(np.float32) * 0.01
        sd[f"classifier.{i}.bias"] = np.zeros(no, np.float32)
    params, stats = import_torchvision_vgg16(sd, with_bn=True)
    assert set(stats) == {f"bn_{i}" for i in range(13)}
    assert params["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    # shapes line up with the model's expectations
    tmpl = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
    for name, leaf in params["conv_5"].items():
        assert tmpl["params"]["conv_5"][name].shape == leaf.shape
