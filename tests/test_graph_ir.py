"""Graph IR (perfmodel.graph): shapes, dtype byte accounting, name scopes,
and lowering parity with direct LayerSpec simulation."""

import math

from ant_quantization_tpu.perfmodel import graph as G
from ant_quantization_tpu.perfmodel.simulator import (ConvSpec, MatMulSpec,
                                                      Simulator)


def _vgg_block():
    g = G.Graph("block")
    with g:
        x = g.tensor((1, 32, 32, 3), "input", G.FQDtype.FXP8)
        with g.name_scope("conv1"):
            w = g.tensor((3, 3, 3, 16), "w", G.FQDtype.FXP4)
            x = G.conv2D(x, w, stride=1, pad=1)
            x = G.relu(x)
        x = G.maxPool(x, 2, 2)
        with g.name_scope("fc"):
            x = G.flatten(x)
            w2 = g.tensor((x.shape[-1], 10), "w", G.FQDtype.FXP4)
            x = G.matmul(x, w2)
    return g, x


def test_shapes_and_sizes():
    g, out = _vgg_block()
    assert out.shape == (1, 10)
    t = G.Tensor((2, 3), dtype=G.FQDtype.FXP4)
    assert t.size == 6 and t.size_in_bits == 24 and t.size_in_bytes == 3
    assert str(G.FQDtype.FXP16) == "FXP16" and G.FQDtype.FXP16.frac == 8
    assert G.FQDtype.BIN.bits == 1


def test_name_scopes_and_registry():
    g, _ = _vgg_block()
    assert any(name.startswith("conv1/") for name in g.ops)
    assert any(name.startswith("fc/") for name in g.ops)
    # every op output is registered
    for op in g.ops.values():
        assert op.output is not None and op.output.name in g.tensors


def test_conv_shape_rules():
    g = G.Graph()
    with g:
        x = g.tensor((1, 224, 224, 3), "x")
        w = g.tensor((7, 7, 3, 64), "w")
        y = G.conv2D(x, w, stride=2, pad=3)
        assert y.shape == (1, 112, 112, 64)
        y2 = G.conv2D(g.tensor((1, 28, 28, 8), "x2"),
                      g.tensor((3, 3, 8, 8), "w2"), pad="SAME")
        assert y2.shape == (1, 28, 28, 8)


def test_lowering_matches_direct_specs():
    g = G.Graph()
    with g:
        x = g.tensor((1, 56, 56, 64), "x", G.FQDtype.FXP4)
        w = g.tensor((3, 3, 64, 64), "w", G.FQDtype.FXP4)
        h = G.conv2D(x, w, stride=1, pad=1, name="c1")
        h = G.relu(h)
        h = G.flatten(h)
        wf = g.tensor((h.shape[-1], 100), "wf", G.FQDtype.FXP8)
        G.matmul(h, wf, name="m1")
    specs = G.to_layer_specs(g)
    assert len(specs) == 2   # relu/flatten are free
    c, m = specs
    assert isinstance(c, ConvSpec) and isinstance(m, MatMulSpec)
    assert (c.k, c.out, c.ic, c.oc, c.iprec, c.wprec) == (3, 56, 64, 64,
                                                          4, 4)
    assert (m.ni, m.no, m.wprec) == (56 * 56 * 64, 100, 8)

    sim = Simulator.named("ant", use_native=False)
    via_graph = sim.network(specs, batch=4)
    direct = sim.network([
        ConvSpec(3, 56, 1, 64, 64, 4, 4),
        MatMulSpec(56 * 56 * 64, 100, 4, 8)], batch=4)
    assert via_graph.total_cycles == direct.total_cycles


def test_matmul_rows_from_sequence_dims():
    g = G.Graph()
    with g:
        x = g.tensor((8, 128, 768), "acts", G.FQDtype.FXP4)
        w = g.tensor((768, 768), "w", G.FQDtype.FXP4)
        G.matmul(x, w)
    (m,) = G.to_layer_specs(g)
    assert m.rows == 128 and m.ni == 768 and m.no == 768


def test_concat_and_add():
    g = G.Graph()
    with g:
        a = g.tensor((1, 8, 8, 16), "a")
        b = g.tensor((1, 8, 8, 32), "b")
        c = G.concat([a, b], axis=-1)
        assert c.shape == (1, 8, 8, 48)
        d = G.add(c, g.tensor((1, 8, 8, 48), "e"))
        assert d.shape == c.shape
