"""Tensor-parallel serving: the engine under shard_map on a (dp, tp) mesh.

Megatron-style sharding of the quantized engine (SURVEY.md §2.8: the
reference has only NCCL data-parallel; tensor sharding of W4/W8 weights
over ICI is the TPU-native capability it lacks):

  q/k/v (+fused qkv) and fc_in   column parallel — each device holds the
                                  weights for its local heads / d_ff slice
  attn out and fc_out            row parallel — partial products psum'd
                                  over the tp axis before the bias
  KV cache                       head-sharded (each device caches only its
                                  local heads' K/V — INT8 shards included)
  embeddings / layernorms        replicated
  batch                          sharded over dp

Inside shard_map every array is the *local* shard, so the Pallas kernels
(fused INT8-KV attention, fused W8A8 matmul) run unchanged on local head /
channel slices — collectives (one psum per row-parallel site) ride ICI
between kernel invocations.

Fused-QKV layouts need one host-side column permutation: the stacked
(D, 3D) kernel concatenates [q|k|v] globally, but each tp shard must hold
[q_d|k_d|v_d] so the engine's local jnp.split stays correct. ``shard_qkv``
reorders columns to interleave per-shard thirds before sharding.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from . import engine as eng

__all__ = ["shard_engine_params", "shard_cache", "make_sharded_forward",
           "tp_engine_config"]


def tp_engine_config(cfg: eng.EngineConfig, mesh: Mesh,
                     tp_axis: str = "tp") -> eng.EngineConfig:
    tp = mesh.shape[tp_axis]
    assert cfg.lm.n_heads % tp == 0, (cfg.lm.n_heads, tp)
    assert cfg.lm.d_ff % tp == 0
    import dataclasses
    return dataclasses.replace(cfg, tp_axis=tp_axis, tp_size=tp)


def _qkv_permutation(d_model: int, tp: int) -> np.ndarray:
    """Column permutation turning global [q|k|v] into per-shard
    [q_d|k_d|v_d] concatenation."""
    d_loc = d_model // tp
    cols = []
    for d in range(tp):
        for third in range(3):
            start = third * d_model + d * d_loc
            cols.append(np.arange(start, start + d_loc))
    return np.concatenate(cols)


def _site_specs(site: str, col: bool) -> Dict[str, P]:
    """PartitionSpecs for one stacked (L, ...) site dict."""
    if col:   # column parallel: output channels sharded
        return {"kernel": P(None, None, "tp"), "w_i8": P(None, None, "tp"),
                "packed": P(None, None, "tp"), "scale": P(None, "tp"),
                "oscale": P(None, "tp"), "bias": P(None, "tp"),
                "kscale": P(None, None),     # conv1d semantics: per-IN
                "grid": P(), "a_grid": P(), "a_alpha": P(), "a_q": P(),
                "a_scale": P()}
    # row parallel: input channels sharded; outputs full (pre-psum)
    return {"kernel": P(None, "tp", None), "w_i8": P(None, "tp", None),
            "packed": P(None, "tp", None), "scale": P(None, None),
            "oscale": P(None, None), "bias": P(None, None),
            "kscale": P(None, "tp"),         # per-IN scale shards with K
            "grid": P(), "a_grid": P(), "a_alpha": P(), "a_q": P(),
            "a_scale": P()}


def engine_param_specs(cfg: eng.EngineConfig) -> Dict:
    """PartitionSpec pytree matching build_engine_params' output."""
    c = cfg.lm
    attn_sites = ("qkv", "out") if c.fused_qkv else ("q", "k", "v", "out")
    layers = {}
    for site in attn_sites + ("fc_in", "fc_out"):
        layers[site] = _site_specs(site, col=site not in ("out", "fc_out"))
    layers["ln_1"] = {"scale": P(), "bias": P()}
    layers["ln_2"] = {"scale": P(), "bias": P()}
    if cfg.lm_head_int8:
        top = {"wte_i8": P(), "wte_scale": P(),
               "ln_f": {"scale": P(), "bias": P()}}
    else:
        top = {"wte": P(), "ln_f": {"scale": P(), "bias": P()}}
    return {"layers": layers, "top": top}


def _repack_w4_row_shards(packed, tp: int):
    """Re-pack a split-K packed (L, K/2, N) weight so each contiguous
    row-shard is a self-contained per-shard split-K pack.

    pack_w4 pairs global rows (r, r + K/2) in one byte; slicing the byte
    rows across tp devices would hand each device bytes whose decoded
    rows straddle other devices' activation slices. Unpack to codes,
    split K into tp chunks, re-pack each chunk — after P(None, 'tp',
    None) sharding, device d holds exactly pack(codes[d*K/tp:(d+1)*K/tp])
    and the engine's local (M, 2, K_loc/2) activation reshape lines up."""
    p = np.asarray(packed)
    L, K2, N = p.shape
    lo, hi = p & 0xF, p >> 4
    codes = np.concatenate([lo, hi], axis=1)          # (L, K, N)
    K_loc = (2 * K2) // tp
    chunks = []
    for d in range(tp):
        c = codes[:, d * K_loc:(d + 1) * K_loc]
        chunks.append(c[:, :K_loc // 2]
                      | (c[:, K_loc // 2:] << 4))
    return jnp.asarray(np.concatenate(chunks, axis=1).astype(np.uint8))


def shard_engine_params(ep: Dict, cfg: eng.EngineConfig,
                        mesh: Mesh) -> Dict:
    """device_put the stacked engine params with TP shardings (fused-qkv
    columns permuted per-shard first; split-K packed W4 re-packed so
    row shards decode to the right K rows)."""
    tp = cfg.tp_size
    ep = dict(ep)
    layers = dict(ep["layers"])
    if tp > 1:
        for name in ("out", "fc_out"):
            site = layers.get(name)
            if site is not None and "packed" in site:
                site = dict(site)
                site["packed"] = _repack_w4_row_shards(site["packed"], tp)
                layers[name] = site
    if cfg.lm.fused_qkv and tp > 1:
        perm = _qkv_permutation(cfg.lm.d_model, tp)
        site = dict(layers["qkv"])
        for key in ("kernel", "w_i8", "packed"):
            if key in site:
                site[key] = site[key][..., perm]
        for key in ("bias", "oscale", "scale"):
            if key in site:
                site[key] = site[key][..., perm]
        layers["qkv"] = site
    ep["layers"] = layers

    specs = engine_param_specs(cfg)

    def place(leaf, spec):
        spec = P(*spec[:getattr(leaf, "ndim", 0)])
        return _put_global(leaf, mesh, spec)

    def walk(node, spec_node):
        if isinstance(node, dict):
            return {k: walk(v, spec_node.get(k, P()) if isinstance(
                spec_node, dict) else P()) for k, v in node.items()}
        return place(node, spec_node if isinstance(spec_node, P) else P())

    return walk(ep, specs)


def cache_spec() -> P:
    # stacked QuantKV leaves: (L, B, H, S[, D]) — batch over dp, heads
    # over tp
    return P(None, "dp", "tp")


def _put_global(leaf, mesh: Mesh, spec: P):
    """device_put with TP/DP shardings, multi-process safe.

    Under a multi-host mesh (jax.distributed, parallel/distributed.py)
    plain device_put cannot target non-addressable devices; the leaf is
    then treated as this HOST'S LOCAL piece of the global array (the
    per-host shard along process-spanning mesh dims — for tp-only specs,
    where tp is host-local ICI, local == global)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(leaf), mesh, spec)
    return jax.device_put(leaf, NamedSharding(mesh, spec))


def shard_cache(kv, mesh: Mesh):
    """Place a stacked cache with (L, B->dp, H->tp) shardings. Multi-host:
    pass the cache built for the LOCAL batch (B_local = B / n_hosts)."""
    return jax.tree_util.tree_map(
        lambda x: _put_global(x, mesh, P(*cache_spec()[:x.ndim])), kv)


def make_sharded_forward(cfg: eng.EngineConfig, mesh: Mesh):
    """jitted (ep, ids, kv, pos0) -> (logits, kv) over the (dp, tp) mesh.

    ``cfg`` must carry tp_axis/tp_size (tp_engine_config). Params/cache
    must be placed by shard_engine_params / shard_cache; logits come back
    replicated over tp, batch-sharded over dp.
    """
    assert cfg.tp_axis, "use tp_engine_config first"
    p_specs = engine_param_specs(cfg)
    kv_spec = cache_spec()

    def to_spec_tree(tree, specs):
        """Spec tree mirroring ``tree``, clipped to each leaf's ndim.
        (PartitionSpec subclasses tuple, so build by hand, not tree_map.)"""
        if isinstance(tree, dict):
            return {k: to_spec_tree(v, specs.get(k, P()) if isinstance(
                specs, dict) else P()) for k, v in tree.items()}
        spec = specs if isinstance(specs, P) else P()
        return P(*spec[:getattr(tree, "ndim", 0)])

    @jax.jit
    def fwd(ep, ids, kv, pos0, last_index=None):
        specs_ep = to_spec_tree(ep, p_specs)
        specs_kv = jax.tree_util.tree_map(
            lambda x: P(*kv_spec[:x.ndim]), kv)
        # last_index rides as a (B,) batch-sharded vector (see
        # eng.forward: serving prefill computes the lm_head only at
        # these positions; logits come back (B, 1, V))
        li = None if last_index is None else jnp.broadcast_to(
            jnp.asarray(last_index, jnp.int32), (ids.shape[0],))

        def local(ep_l, ids_l, kv_l, pos0_l, li_l=None):
            return eng.forward(cfg, ep_l, ids_l, kv_l, pos0_l,
                               last_index=li_l)

        in_specs = [specs_ep, P("dp", None), specs_kv, P("dp")]
        args = [ep, ids, kv, pos0]
        if li is not None:
            in_specs.append(P("dp"))
            args.append(li)
        sm = shard_map(
            local, mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P("dp", None, None), specs_kv),
            check_vma=False)
        return sm(*args)

    return fwd
