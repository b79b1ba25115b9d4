"""Trunk pinning for spatially-sharded training.

Under a ('data', 'spatial') mesh the decoders run with image height sharded
(that is where the full-resolution activations live), but the OS16 trunk
(backbone + ASPP) must stay batch-sharded-only: its activations are
small-spatial so replicating H is nearly free, and an H-sharded trunk
reproducibly produces WRONG backbone parameter gradients (up to 160%
relative on the first step, forward exact) through the dilated-conv ASPP
region of the full graph on XLA's SPMD partitioner — see
tests/test_spatial_sharding.py, which fails loudly without these pins.

A single input-side ``with_sharding_constraint`` cannot protect the trunk:
GSPMD propagates the decoder outputs' H-sharding backwards into trunk
intermediates.  Instead the model brackets the trunk by pinning its tensors
batch-only at module boundaries via :func:`pin_trunk`, which is a no-op
unless the train step has armed :func:`trunk_pinning` with the active mesh
(a trace-time contextvar — zero cost in every other configuration).
"""

import contextlib
import contextvars

import jax
from jax.sharding import NamedSharding, PartitionSpec

_SPATIAL_MESH = contextvars.ContextVar('dsrl_spatial_mesh', default=None)


@contextlib.contextmanager
def trunk_pinning(mesh):
    """Arm :func:`pin_trunk` with ``mesh`` for the enclosed trace (pass
    None to keep it disarmed)."""
    token = _SPATIAL_MESH.set(mesh)
    try:
        yield
    finally:
        _SPATIAL_MESH.reset(token)


def pin_trunk(x):
    """Constrain ``x`` to batch-('data')-only sharding when spatial trunk
    pinning is armed; identity otherwise."""
    mesh = _SPATIAL_MESH.get()
    if mesh is None:
        return x
    spec = PartitionSpec('data', *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
