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

import functools
import os
import time

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.logging import CAUTION, INFO


def make_mesh(devices=None, spatial: int = 1) -> Mesh:
    """1-D ``('data',)`` mesh, or — with ``spatial > 1`` — a 2-D
    ``('data', 'spatial')`` mesh whose second axis shards the image HEIGHT
    of every batch (see ``batch_sharding``).  Spatial sharding splits the
    full-resolution decoder activations (the largest tensors in the
    program) across chips; GSPMD inserts the conv halo exchanges and
    partial-reduction collectives, so results stay bit-identical in
    semantics to the unsharded program.  Use it when per-chip batch 1 still
    does not fit, or to scale one sample across chips for latency."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if spatial > 1:
        if len(devices) % spatial:
            raise ValueError("spatial={} must divide the device count {}"
                             .format(spatial, len(devices)))
        if jax.process_count() > 1 and jax.local_device_count() % spatial:
            # jax.devices() is process-major, so rows of `spatial` devices
            # stay within one process iff spatial divides the local count —
            # otherwise a spatial group would span hosts and the loaders'
            # make_array_from_process_local_data staging (each process
            # supplies full-height local batches) could not address it.
            raise ValueError(
                "spatial={} must divide the local device count {} on "
                "multi-process meshes (a spatial group cannot span hosts)"
                .format(spatial, jax.local_device_count()))
        grid = np.array(devices).reshape(len(devices) // spatial, spatial)
        return Mesh(grid, ('data', 'spatial'))
    return Mesh(np.array(devices), ('data',))


def spatial_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get('spatial', 1) if mesh is not None else 1


def data_shards_per_process(mesh: Mesh) -> int:
    """Per-process shard count of the BATCH axis (the padding multiple for
    ragged eval batches) — the 'data' axis size only: a 'spatial' axis
    shards height, not samples."""
    return max(1, mesh.shape.get('data', 1) // jax.process_count())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """First axis sharded over 'data'; on a 2-D mesh, axis 1 (image height,
    NHWC / NHW) additionally sharded over 'spatial'; rest replicated."""
    if 'spatial' in mesh.axis_names and ndim >= 3:
        return NamedSharding(mesh, P('data', 'spatial', *([None] * (ndim - 2))))
    return NamedSharding(mesh, P('data', *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@functools.lru_cache(maxsize=8)
def count_valid_fn(mesh: Mesh):
    """Jitted global sum of a sharded sample mask as a replicated scalar.

    Used to weight per-batch (global) masked loss means by the true global
    valid count on multi-process meshes, where each process's local count
    differs on ragged final batches.  Cached per mesh: a fresh jit(lambda)
    per validation pass would re-trace (and on TPU, re-pay the remote
    compile service) every epoch."""
    return jax.jit(lambda m: m.sum(), out_shardings=NamedSharding(mesh, P()))


def shard_batch(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree)


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_shards(imgs_u8, segs_u8, multiple, valid=None):
    """Pad a host batch up to a multiple of the per-process shard count.

    Returns ``(imgs, segs, mask)`` where mask (B,) f32 is 1 for real samples
    and 0 for padding — the eval step (train/steps.py::make_eval_step) drops
    masked rows from every loss and metric, making drop_last=False evaluation
    exact on a sharded mesh.  ``valid`` is the Loader's per-sample mask
    (drop_last=False shard padding — cyclic DUPLICATES the batch shapes
    cannot reveal, data/pipeline.py::ShardedSampler); it folds into the
    returned mask so duplicated samples are not double-counted either."""
    n = imgs_u8.shape[0]
    pad = (-n) % max(multiple, 1)
    mask = np.ones((n + pad,), np.float32)
    if valid is not None:
        mask[:n] = np.asarray(valid, np.float32)
    if pad:
        mask[n:] = 0.0
        imgs_u8 = np.concatenate([imgs_u8, np.zeros((pad, *imgs_u8.shape[1:]), imgs_u8.dtype)])
        segs_u8 = np.concatenate([segs_u8, np.zeros((pad, *segs_u8.shape[1:]), segs_u8.dtype)])
    return imgs_u8, segs_u8, mask


def is_master_rank() -> bool:
    """Replaces the reference's RANK == 0 gating (main.py:40)."""
    return jax.process_index() == 0


def distributed_init_kwargs(distributed: dict):
    """Translate the reference's --distributed 7-tuple
    (MASTER_ADDR MASTER_PORT NODES DEVICES_PER_NODE BACKEND INIT_METHOD
    NODE_ID, /root/reference/main.py:19-43) into
    ``jax.distributed.initialize`` kwargs.

    Topology note: the reference spawns ONE single-GPU process per device
    (WORLD_SIZE = NODES x DEVICES_PER_NODE, main.py:32-35).  A JAX process
    owns every local chip, so the process world is NODES and the data mesh
    spans NODES x local-chip-count devices — the same global batch layout
    with a flatter process tree.  DEVICES_PER_NODE therefore does not enter
    the process count; it is validated against the realized local device
    count after initialization (see ``initialize_distributed``).

    Returns ``(kwargs, cautions)`` — pure, unit-testable, no backend use.
    """
    cautions = []
    backend = distributed.get('BACKEND')
    if backend not in (None, 'xla'):
        cautions.append("Distributed backend '{}' is ignored on TPU: XLA owns the "
                        "interconnect (ICI/DCN collectives).".format(backend))
    init_method = (distributed.get('INIT_METHOD') or '').strip()
    if init_method and init_method != 'env://':
        cautions.append("INIT_METHOD '{}' is ignored: jax.distributed rendezvous "
                        "always goes through the coordinator address.".format(init_method))
    kwargs = dict(
        coordinator_address='{}:{}'.format(distributed['MASTER_ADDR'],
                                           distributed['MASTER_PORT']),
        num_processes=int(distributed['NODES']),
        process_id=int(distributed['NODE_ID']))
    return kwargs, cautions


def rendezvous_barrier(name: str, timeout_ms: int = 1_200_000):
    """Align every process at a coordination-service barrier (pure gRPC, no
    device collective).  Used immediately before the FIRST cross-process
    collective: its communicator initialization has a hard ~30 s window (XLA
    CPU gloo context / KV lookups), while host-side model init, zoo-weight
    loading and tracing can skew ranks by minutes.

    Returns True iff the barrier was actually taken (callers that log or
    assert on alignment must not claim it on the best-effort fallback)."""
    if jax.process_count() <= 1:
        return True
    try:
        from jax._src import distributed as _distributed
        client = getattr(_distributed.global_state, 'client', None)
        if client is not None:
            client.wait_at_barrier('dsrl_' + name, timeout_ms)
            return True
    except Exception as exc:  # barrier is best-effort; collectives still sync
        print(CAUTION("Rendezvous barrier '{}' unavailable: {}".format(name, exc)))
    return False


def align_first_dispatch(name: str, compile_fn):
    """Compile a step's programs on every process, then meet at a barrier,
    BEFORE the step's first execution.

    The first execution of a program with cross-process collectives
    initializes its communicator contexts, and that handshake has a hard
    ~30 s window (XLA's gloo KV exchange on CPU; the ICI/DCN equivalents on
    TPU are also finite) — while jit compiles lazily AT that first call, and
    compile times skew across ranks by MINUTES whenever one rank hits the
    persistent compile cache and another misses.  The fast rank then sits in
    communicator init, times out, and the whole job dies with a misleading
    "connection reset" on the surviving ranks.

    ``compile_fn`` must AOT-compile the exact program of the upcoming
    dispatch (``step.lower(*real_args).compile()``).  Measured on jax 0.9:
    the real call afterwards pays only retrace + in-process-cache lookup
    (~0.7 s on a 16 s-compile program), so the post-barrier skew is
    sub-second on every rank.  Best-effort: on failure the dispatch is
    merely unaligned, which is today's behavior.  Single-process runs
    return immediately.

    ``DSRL_TPU_INJECT_COMPILE_DELAY='<rank>:<seconds>'`` injects a sleep on
    one rank between its compile and the barrier — fault injection for
    exactly the skew this protects against (used by the 2-process CLI test;
    without the barrier a 45 s delay reproduces the communicator-init
    timeout).
    """
    if jax.process_count() <= 1:
        return
    compiled = True
    try:
        compile_fn()
    except Exception as exc:
        compiled = False
        print(CAUTION("AOT pre-compile for '{}' failed ({}); its first "
                      "dispatch stays unaligned — a cross-rank compile-time "
                      "skew above the communicator-init window may abort the "
                      "run.".format(name, exc)))
    inject = os.environ.get('DSRL_TPU_INJECT_COMPILE_DELAY')
    if inject:
        try:  # test-only fault injection; a malformed value must not abort
            rank, _, seconds = inject.partition(':')
            rank, seconds = int(rank), float(seconds)
        except ValueError:
            print(CAUTION("Ignoring malformed DSRL_TPU_INJECT_COMPILE_DELAY="
                          "{!r} (expected '<rank>:<seconds>').".format(inject)))
        else:
            if rank == jax.process_index():
                time.sleep(seconds)
    # Every rank must still reach the barrier on a failed compile (the
    # OTHERS are waiting at it); only the INFO claim is gated, so the
    # distributed tests asserting on it catch a silently-disabled barrier.
    if rendezvous_barrier('align_' + name) and compiled:
        print(INFO("First dispatch of '{}' aligned across {} processes."
                   .format(name, jax.process_count())))


def initialize_distributed(distributed: dict):
    """Initialize multi-host JAX from the reference's --distributed tuple."""
    kwargs, cautions = distributed_init_kwargs(distributed)
    for message in cautions:
        print(CAUTION(message))
    jax.distributed.initialize(**kwargs)
    expected_local = int(distributed.get('DEVICES_PER_NODE') or 0)
    if expected_local and expected_local != jax.local_device_count():
        print(CAUTION("DEVICES_PER_NODE={} but this process drives {} local "
                      "device(s); on TPU one process owns every local chip, so "
                      "the effective world is NODES processes x local chips."
                      .format(expected_local, jax.local_device_count())))
