"""Multi-host runtime: the TPU-native replacement for the reference's
``torch.distributed.init_process_group`` + per-rank launch scripts.

The reference starts one process per GPU with ``torch.distributed.launch``
and initializes NCCL (ant_quantization/ImageNet/main.py:79,
BERT/run_glue.py:420, olive llm/run_clm.py:324); gradients sync through
DDP and calibration statistics through hand-written all_reduce/broadcast
(antquant/quant_modules.py:517-531). On TPU the equivalent is one process
per *host*: ``jax.distributed.initialize`` connects the hosts, every
process sees the global device set, and a single (dcn, ici) mesh +
GSPMD shardings replace all hand-written collectives — gradient psums,
calibration statistics, and checkpoint-path broadcasts all fall out of
the sharded program.

Usage (every CLI in tools/ calls :func:`initialize_from_env` first):

  # v5e multi-host (one line per host, or via the TPU VM launcher which
  # sets the env automatically):
  ANT_COORDINATOR=10.0.0.2:8476 ANT_NUM_PROCESSES=4 ANT_PROCESS_ID=$i \
      python tools/clm_eval.py ...

  # on Cloud TPU pods jax.distributed.initialize() autodetects the
  # topology from the metadata server, so plain
  ANT_DISTRIBUTED=1 python tools/clm_eval.py ...
  # is enough — no coordinator env needed.

  # 2-process CPU dryrun (what tools/multihost_dryrun.py automates):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      ANT_COORDINATOR=127.0.0.1:8476 ANT_NUM_PROCESSES=2 \
      ANT_PROCESS_ID=$i python ...

Data feeding is per-host: each process loads shard
``(jax.process_index(), jax.process_count())`` of the dataset (the
harness readers already take ``shard=``, mirroring DALI's per-rank
shards) and :func:`host_batch_to_global` assembles the host-local arrays
into one globally-sharded jax.Array for the mesh — the TPU-native analog
of DistributedSampler.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "initialize_from_env", "is_multiprocess",
           "process_shard", "make_hybrid_mesh", "host_batch_to_global",
           "sync_global_devices"]

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Connect this process to the multi-host runtime.

    With explicit arguments, passes them to ``jax.distributed.initialize``
    (CPU/GPU clusters, tests). With all-None arguments, relies on JAX's
    cluster autodetection (Cloud TPU metadata, SLURM, ...). Returns True
    if initialization ran, False if it was skipped (already initialized).
    Idempotent per process.
    """
    global _initialized
    if _initialized:
        return False
    kw = {}
    if coordinator is not None:
        kw = dict(coordinator_address=coordinator,
                  num_processes=int(num_processes),
                  process_id=int(process_id))
    jax.distributed.initialize(**kw)
    _initialized = True
    return True


def initialize_from_env() -> bool:
    """Env-driven entry used by the tools/ CLIs. No-op unless requested.

    ANT_COORDINATOR=host:port + ANT_NUM_PROCESSES + ANT_PROCESS_ID
        explicit rendezvous (CPU dryruns, byo-cluster);
    ANT_DISTRIBUTED=1
        autodetected topology (Cloud TPU pods).
    """
    coord = os.environ.get("ANT_COORDINATOR")
    if coord:
        return initialize(coord, os.environ["ANT_NUM_PROCESSES"],
                          os.environ["ANT_PROCESS_ID"])
    if os.environ.get("ANT_DISTRIBUTED") == "1":
        return initialize()
    return False


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_shard() -> Tuple[int, int]:
    """(process_index, process_count) — the harness readers' ``shard=``
    argument, the analog of the reference's per-rank DALI shards
    (ImageNet/dataloader.py:90-197)."""
    return jax.process_index(), jax.process_count()


def make_hybrid_mesh(ici_shape: Optional[Tuple[int, ...]] = None,
                     dcn_axis: str = "dp",
                     ici_axes: Tuple[str, ...] = ("tp",),
                     devices: Optional[Sequence] = None) -> Mesh:
    """A (dcn, ici) mesh: the slowest axis spans hosts over DCN, the fast
    axes stay inside each host/slice over ICI.

    Layer rule (jax-ml.github.io/scaling-book): collectives that run
    every step (tensor-parallel psums) must ride ICI, so 'tp' (and any
    other ici_axes) is laid out within a host's local devices; the
    gradient/data axis crosses hosts over DCN where one all-reduce per
    step is cheap. Single-process: the DCN axis has size 1 and this
    degenerates to the ordinary mesh.

    ici_shape defaults to all local devices on the first ici axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    # group devices by owning process so the ici axes are host-local
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    hosts = sorted(by_proc)
    per_host = len(by_proc[hosts[0]])
    assert all(len(by_proc[h]) == per_host for h in hosts), \
        "uneven local device counts"
    if ici_shape is None:
        ici_shape = (per_host,) + (1,) * (len(ici_axes) - 1)
    assert int(np.prod(ici_shape)) == per_host, (ici_shape, per_host)
    arr = np.asarray([by_proc[h] for h in hosts]).reshape(
        (len(hosts),) + tuple(ici_shape))
    return Mesh(arr, (dcn_axis,) + tuple(ici_axes))


def host_batch_to_global(batch, mesh: Mesh, spec: P):
    """Assemble per-host numpy/jax batches into one global jax.Array.

    Each host passes ITS shard (e.g. its slice of the global batch along
    the dp axis); the result is a sharded global array addressable by
    jit over ``mesh``. Single-process: a plain device_put."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, spec), batch)


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier (the reference's dist.barrier,
    quant_utils.py:45-55). No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)
