"""Multi-host dryrun: prove the jax.distributed runtime path end-to-end.

Run with no arguments to spawn N worker processes on this machine, each
with V virtual CPU devices; every worker

  1. calls parallel.distributed.initialize (explicit rendezvous),
  2. builds the hybrid (dcn='dp', ici='tp') mesh — dp spans the
     processes, tp stays process-local,
  3. loads ITS data shard (process_shard) and assembles the global batch
     with host_batch_to_global,
  4. jits one REAL quantized training step (the flagship TransformerLM
     with OliVe fake-quant) over the mesh — the gradient all-reduce over
     dp therefore crosses processes, exercising real cross-process
     collectives (Gloo on CPU, DCN on a TPU pod),
  5. asserts the loss is finite and bit-identical across processes
     (multihost broadcast of process 0's loss).

On a real v5e multi-host slice the same code path is entered via the env
(see parallel/distributed.py docstring):

  ANT_DISTRIBUTED=1 python tools/multihost_dryrun.py --worker \
      --no-virtual   # one line per host; topology autodetected

This is the TPU-native equivalent of the reference's
``python -m torch.distributed.launch --nproc_per_node=4 main.py``
(ant_quantization/ImageNet/main.py:79, scripts/resnet50_qat.sh).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(args) -> None:
    # env must be set before jax imports; the launcher does this, but a
    # hand-run worker gets the same defaults
    import jax

    from ant_quantization_tpu.parallel import distributed as dist

    dist.initialize_from_env()
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import PartitionSpec as P

    from ant_quantization_tpu.parallel.mesh import (LM_PARAM_RULES,
                                                    LM_QUANT_RULES,
                                                    shard_pytree)

    pid, nproc = dist.process_shard()
    mesh = dist.make_hybrid_mesh(dcn_axis="dp", ici_axes=("tp",))
    assert mesh.shape["dp"] == nproc, mesh.shape
    print(f"[{pid}] mesh={dict(mesh.shape)} local={jax.local_device_count()}"
          f" global={jax.device_count()}", flush=True)

    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    model, cfg = ge._flagship(n_layers=2, d_model=128, vocab=512)

    # deterministic global batch, each process loads only ITS shard —
    # per-host data feeding, the DistributedSampler/DALI-shard analog
    B_global, T = 4 * nproc, 16
    all_ids = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (B_global, T))
    local = all_ids[pid * (B_global // nproc):(pid + 1) * (B_global // nproc)]
    batch = dist.host_batch_to_global(jnp.asarray(local), mesh,
                                      P(("dp",), None))

    variables = ge._init_with_quant(model, jnp.asarray(all_ids[:2]))
    params = shard_pytree(variables["params"], mesh, LM_PARAM_RULES)
    quant = shard_pytree(variables["quant"], mesh,
                         LM_QUANT_RULES + LM_PARAM_RULES)
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    def loss_fn(params, quant, ids):
        logits = model.apply({"params": params, "quant": quant}, ids)
        targets = jnp.roll(ids, -1, axis=1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], targets[:, :-1]).mean()

    @jax.jit
    def train_step(params, opt_state, quant, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, quant, ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        params, opt_state, loss = train_step(params, opt_state, quant, batch)
        jax.block_until_ready(loss)
    loss = float(loss)
    assert np.isfinite(loss), loss

    # every process must have computed the same global loss
    from jax.experimental import multihost_utils
    loss0 = float(multihost_utils.broadcast_one_to_all(jnp.asarray(loss)))
    assert abs(loss - loss0) < 1e-6, (loss, loss0)

    # --- serving step across processes (VERDICT r4 #5): the TP-sharded
    # engine runs one prefill + one decode step over the SAME hybrid
    # mesh — batch dp-sharded across hosts, heads tp-sharded host-local
    # — and the gathered logits must match the single-process engine.
    from ant_quantization_tpu.serve import engine as E
    from ant_quantization_tpu.serve import sharded as shd

    ecfg = E.EngineConfig(lm=cfg, weight_mode="w4", act_bits=4,
                          kv_int8=True, max_seq=32, dtype=jnp.float32,
                          interpret=True)
    tcfg = shd.tp_engine_config(ecfg, mesh)
    ep = E.build_engine_params(ecfg, variables["params"],
                               variables["quant"])
    B_loc, T_s = 2, 8
    B_s = B_loc * nproc
    sids = np.random.default_rng(1).integers(0, cfg.vocab_size, (B_s, T_s))

    # single-process reference: full batch through the unsharded engine
    kv_ref = E.init_cache(ecfg, B_s)
    ref1, kv_ref = E.forward(ecfg, ep, jnp.asarray(sids), kv_ref, 0)
    ref_tok = jnp.argmax(ref1[:, -1:], axis=-1)
    ref2, _ = E.forward(ecfg, ep, ref_tok, kv_ref, T_s)

    eps = shd.shard_engine_params(ep, tcfg, mesh)
    gids = dist.host_batch_to_global(
        jnp.asarray(sids[pid * B_loc:(pid + 1) * B_loc]), mesh,
        P(("dp",), None))
    kvs = shd.shard_cache(E.init_cache(ecfg, B_loc), mesh)
    pos0 = dist.host_batch_to_global(
        jnp.zeros((B_loc,), jnp.int32), mesh, P(("dp",)))
    posT = dist.host_batch_to_global(
        jnp.full((B_loc,), T_s, jnp.int32), mesh, P(("dp",)))
    fwd = shd.make_sharded_forward(tcfg, mesh)
    with mesh:
        log1, kvs = fwd(eps, gids, kvs, pos0)
        tok = jnp.argmax(log1[:, -1:], axis=-1)
        log2, kvs = fwd(eps, tok, kvs, posT)
    loc2 = multihost_utils.global_array_to_host_local_array(
        log2, mesh, P(("dp",), None, None))
    np.testing.assert_allclose(
        np.asarray(loc2),
        np.asarray(ref2)[pid * B_loc:(pid + 1) * B_loc],
        rtol=2e-4, atol=2e-4)
    print(f"[{pid}] SERVING OK decode logits match single-process",
          flush=True)

    dist.sync_global_devices("dryrun_done")
    print(f"[{pid}] MULTIHOST OK loss={loss:.6f}", flush=True)


def launch(args) -> int:
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(args.num_processes):
        env = dict(env_base)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(env_base.get("XLA_FLAGS", "")
                       + f" --xla_force_host_platform_device_count="
                         f"{args.devices_per_process}").strip(),
            ANT_COORDINATOR=f"127.0.0.1:{args.port}",
            ANT_NUM_PROCESSES=str(args.num_processes),
            ANT_PROCESS_ID=str(pid),
            PYTHONPATH=REPO + os.pathsep + env_base.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=args.timeout)
        ok = p.returncode == 0 and "MULTIHOST OK" in out
        print(f"--- process {pid} rc={p.returncode} ---")
        print("\n".join(out.splitlines()[-6:]))
        if not ok:
            rc = 1
    print("MULTIHOST DRYRUN " + ("PASSED" if rc == 0 else "FAILED"))
    return rc


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--worker", action="store_true",
                    help="run as a worker (internal; spawned by launcher)")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()
    if args.worker:
        # worker env set by launcher (or by the user on a real pod)
        import jax
        jax.config.update("jax_platforms",
                          os.environ.get("JAX_PLATFORMS", "cpu"))
        worker(args)
        return 0
    return launch(args)


if __name__ == "__main__":
    raise SystemExit(main())
