"""Spatial-sharding contract: a ('data', 'spatial') mesh that shards image
HEIGHT across chips must train identically to a single device.

The reference has no model-parallel mode at all (its only parallelism is
one-process-per-GPU DDP, /root/reference/command_handlers/
train_or_resume.py:105-106); spatial partitioning is the TPU-native
capability for inputs whose full-resolution decoder activations exceed one
chip.  Everything outside the Pallas tail is pure jit + GSPMD, so XLA
inserts the conv halo exchanges and partial-reduction collectives itself
and the sharded program is SEMANTICALLY the unsharded one — which is
exactly what this test pins (the train step swaps the Pallas tail for the
grouped XLA tail under a spatial mesh, train/steps.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.parallel import (
    make_mesh, replicate, shard_batch, batch_sharding, spatial_axis_size,
    data_shards_per_process)
from dualsuperreslearningforsemseg_tpu.train import (sgd_init, make_train_step,
                                                     TrainState)

IN_HW = (32, 64)
OUT_HW = (64, 128)


def _run(devices, batch, spatial=1, stage=3, n_steps=1):
    model = DSRL(stage=stage, num_classes=cs.NUM_CLASSES)
    mesh = make_mesh(devices, spatial=spatial)
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, *IN_HW, 3), jnp.float32), False)
    state = TrainState(params=replicate(variables['params'], mesh),
                       batch_stats=replicate(variables['batch_stats'], mesh),
                       momentum=replicate(sgd_init(variables['params']), mesh))
    # fused_tail=False on BOTH runs: the spatial path swaps to the XLA tail
    # by construction, and fused-vs-XLA tail equality is pinned separately
    # (tests/test_pallas_tail.py) — comparing like with like isolates the
    # sharding semantics.
    train_step = make_train_step(model, stage=stage, w1=0.1, w2=1.0,
                                 momentum=0.9, weight_decay=0.0005,
                                 ignore_label=cs.IGNORE_CLASS_LABEL,
                                 freeze_batch_norm=True, mesh=mesh,
                                 fused_tail=False)
    img_lo, img_hi, seg = shard_batch(batch, mesh)

    key = jax.random.PRNGKey(11)
    losses = None
    for _ in range(n_steps):
        key, step_key = jax.random.split(key)
        state, losses = train_step(state, img_lo, img_hi, seg,
                                   jnp.float32(0.01), step_key)
    return (jax.device_get(state.params),
            {k: float(v) for k, v in losses.items()})


def test_mesh_helpers():
    devices = jax.devices()
    assert len(devices) >= 8
    mesh = make_mesh(devices[:8], spatial=2)
    assert mesh.axis_names == ('data', 'spatial')
    assert mesh.shape['data'] == 4 and mesh.shape['spatial'] == 2
    assert spatial_axis_size(mesh) == 2
    assert data_shards_per_process(mesh) == 4
    # batch sharding: axis 0 over data, axis 1 (height) over spatial
    s4 = batch_sharding(mesh, 4)
    assert s4.spec == jax.sharding.PartitionSpec('data', 'spatial', None, None)
    assert batch_sharding(mesh, 1).spec == jax.sharding.PartitionSpec('data')
    with pytest.raises(ValueError):
        make_mesh(devices[:8], spatial=3)


def _batch(rng):
    return (jnp.asarray(rng.standard_normal((4, *IN_HW, 3)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((4, *OUT_HW, 3)).astype(np.float32)),
            jnp.asarray(rng.integers(0, cs.NUM_CLASSES,
                                     size=(4, *OUT_HW)).astype(np.int32)))


def _assert_params_close(params_sp, params_1, n_steps, atol):
    flat_sp = jax.tree_util.tree_leaves_with_path(params_sp)
    flat_1 = dict(jax.tree_util.tree_leaves_with_path(params_1))
    assert len(flat_sp) == len(flat_1)
    for path, leaf in flat_sp:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_1[path]), rtol=3e-3, atol=atol,
            err_msg="params diverged after {} spatial-sharded steps at {}"
                    .format(n_steps, jax.tree_util.keystr(path)))


def test_spatial_stage3_one_step_equals_1dev(rng):
    """One full stage-3 step (forward + CE/MSE/FA grads + SGD update) on a
    (4 data x 2 spatial) mesh matches a single device to reassociation
    noise.  One step only: FA's spectral power iteration amplifies the
    ~1e-6 reassociation noise of the sharded per-sample H-reductions
    chaotically ACROSS steps (measured ~10% FA drift by step 2 — under
    data-only sharding per-sample compute never reassociates, which is why
    tests/test_sharded_equivalence.py can run 3 steps tightly), so
    multi-step equivalence is pinned at stage 2 below where every loss is
    smooth."""
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide the virtual 8-CPU mesh"
    batch = _batch(rng)
    params_sp, losses_sp = _run(devices[:8], batch, spatial=2, stage=3)
    params_1, losses_1 = _run(devices[:1], batch, spatial=1, stage=3)
    for k in losses_1:
        np.testing.assert_allclose(losses_sp[k], losses_1[k], rtol=1e-5,
                                   atol=1e-5,
                                   err_msg="loss '{}' diverged".format(k))
    _assert_params_close(params_sp, params_1, 1, atol=1e-5)


def test_spatial_stage2_three_steps_equal_1dev(rng):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide the virtual 8-CPU mesh"
    batch = _batch(rng)
    params_sp, losses_sp = _run(devices[:8], batch, spatial=2, stage=2,
                                n_steps=3)
    params_1, losses_1 = _run(devices[:1], batch, spatial=1, stage=2,
                              n_steps=3)
    for k in losses_1:
        np.testing.assert_allclose(losses_sp[k], losses_1[k], rtol=3e-3,
                                   atol=1e-4,
                                   err_msg="loss '{}' diverged".format(k))
    _assert_params_close(params_sp, params_1, 3, atol=1e-4)


def test_first_local_sample_assembles_spatial_shards():
    """The validator's example-image fetch must reassemble a sample whose
    HEIGHT is sharded over the spatial axis — one shard alone is a 1/k crop."""
    import jax
    from dualsuperreslearningforsemseg_tpu.commands.train_or_resume import _first_local_sample

    devices = jax.devices()[:4]
    mesh = make_mesh(devices, spatial=2)
    x = np.arange(2 * 8 * 4 * 3, dtype=np.float32).reshape(2, 8, 4, 3)
    xd = jax.device_put(x, batch_sharding(mesh, 4))
    np.testing.assert_array_equal(_first_local_sample(xd), x[0])
    # g16-layout arrays carry the sample axis SECOND.
    from jax.sharding import NamedSharding, PartitionSpec as P
    y = np.arange(16 * 2 * 4, dtype=np.int32).reshape(16, 2, 4)
    yd = jax.device_put(y, NamedSharding(mesh, P(None, 'data')))
    np.testing.assert_array_equal(_first_local_sample(yd, axis=1), y[:, 0])
