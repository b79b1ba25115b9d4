"""Device mesh + sharding for data parallelism.

The reference's distributed layer is spawn-per-device DDP over
gloo/mpi/nccl with env-var rendezvous (/root/reference/main.py:19-43,
command_handlers/train_or_resume.py:27-41).  The TPU-native equivalent
(SURVEY.md §2.3): one 1-D ``jax.sharding.Mesh`` over all devices, the batch
sharded on the ``'data'`` axis and parameters replicated; jit's GSPMD
partitioner inserts the gradient all-reduce over ICI — there is no explicit
collective and no backend choice (XLA owns the fabric; the CLI's
gloo/mpi/nccl argument is accepted and warned about).

Multi-host topologies initialize through ``jax.distributed.initialize`` with
the reference CLI's MASTER_ADDR/PORT/NODES/NODE_ID mapped onto
coordinator_address/num_processes/process_id.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.logging import CAUTION


def make_mesh(devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), ('data',))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """First axis sharded over 'data', rest replicated."""
    return NamedSharding(mesh, P('data', *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree)


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def is_master_rank() -> bool:
    """Replaces the reference's RANK == 0 gating (main.py:40)."""
    return jax.process_index() == 0


def initialize_distributed(distributed: dict):
    """Map the reference's --distributed 7-tuple onto jax.distributed.

    BACKEND and DEVICES_PER_NODE are accepted for CLI parity and ignored: the
    XLA runtime owns every local device of a process and the ICI/DCN fabric.
    """
    if distributed.get('BACKEND') not in (None, 'xla'):
        print(CAUTION("Distributed backend '{}' is ignored on TPU: XLA owns the "
                      "interconnect (ICI/DCN collectives).".format(distributed.get('BACKEND'))))
    coordinator = '{}:{}'.format(distributed['MASTER_ADDR'], distributed['MASTER_PORT'])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=distributed['NODES'],
                               process_id=distributed['NODE_ID'])
