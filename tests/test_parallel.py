"""GSPMD sharding: tp/dp mesh rules produce the same numerics as
single-device execution, and the graft entry points run."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ant_quantization_tpu.models.transformer_lm import LMConfig, TransformerLM
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.parallel.mesh import (LM_PARAM_RULES,
                                                LM_QUANT_RULES,
                                                lm_batch_spec, make_mesh,
                                                shard_pytree, spec_for_path)


def test_spec_rules():
    assert spec_for_path("h_0/attn/qkv/kernel", LM_PARAM_RULES) == P(None, "tp")
    assert spec_for_path("h_3/attn/out/kernel", LM_PARAM_RULES) == P("tp", None)
    assert spec_for_path("h_1/fc_out/kernel", LM_PARAM_RULES) == P("tp", None)
    assert spec_for_path("h_1/ln_1/scale", LM_PARAM_RULES) == P()
    assert spec_for_path("h_0/fc_in/weight_q/alpha", LM_QUANT_RULES) == P("tp")


def test_sharded_forward_matches_single_device(devices, rng):
    cfg = LMConfig(vocab_size=256, d_model=64, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=64)
    qcfg = QuantConfig(mode="ant-int-flint", family="olive",
                       w_low=100, w_up=101, a_low=100, a_up=101)
    model = TransformerLM(cfg, qcfg)
    ids = jnp.asarray(rng.integers(0, 256, size=(4, 16)))
    variables = model.init(jax.random.PRNGKey(0), ids)
    _, upd = model.apply(variables, ids, mutable=["quant"])
    params, quant = variables["params"], upd["quant"]

    ref = model.apply({"params": params, "quant": quant}, ids)

    mesh = make_mesh((2, 4), devices=devices)
    p_sh = shard_pytree(params, mesh, LM_PARAM_RULES)
    q_sh = shard_pytree(quant, mesh, LM_QUANT_RULES + LM_PARAM_RULES)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, lm_batch_spec()))

    @jax.jit
    def fwd(p, q, i):
        return model.apply({"params": p, "quant": q}, i)

    with mesh:
        got = fwd(p_sh, q_sh, ids_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_graft_entry_points(devices):
    import __graft_entry__ as g
    fn, args = g.entry.__wrapped__() if hasattr(g.entry, "__wrapped__") \
        else g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 32000
    g.dryrun_multichip(8)
