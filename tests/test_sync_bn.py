"""Cross-replica BatchNorm: sharded sync-BN must equal single-device BN over
the concatenated global batch (exact, not the per-shard-variance average)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dualsuperreslearningforsemseg_tpu.models.norm import TorchBatchNorm


def test_sync_bn_matches_global_batch(rng):
    features = 8
    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices), ('data',))

    # Shards with deliberately different means so the naive per-shard
    # variance average would be wrong.
    x = rng.standard_normal((8, 4, 4, features)).astype(np.float32)
    x[:4] += 3.0

    bn_sync = TorchBatchNorm(features, axis_name='data')
    bn_plain = TorchBatchNorm(features)
    variables = bn_plain.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    ref, ref_mut = bn_plain.apply(variables, jnp.asarray(x), False,
                                  mutable=['batch_stats'])

    def sharded_apply(xs):
        out, mut = bn_sync.apply(variables, xs, False, mutable=['batch_stats'])
        return out, mut['batch_stats']['running_mean'], mut['batch_stats']['running_var']

    fn = shard_map(sharded_apply, mesh=mesh,
                   in_specs=P('data'),
                   out_specs=(P('data'), P(), P()))
    out, rm, rv = fn(jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rm),
                               np.asarray(ref_mut['batch_stats']['running_mean']),
                               rtol=1e-5, atol=1e-6)
    # NB: running_var differs slightly by design: torch's unbiased correction
    # uses the GLOBAL n here (8*4*4) vs per-shard n in the unsync reference —
    # with n large both converge; check against the true global stat.
    xf = x.reshape(-1, features)
    expected_var = xf.var(axis=0, ddof=1)
    np.testing.assert_allclose(np.asarray(rv), 0.9 * 1.0 + 0.1 * expected_var,
                               rtol=1e-3, atol=1e-4)


def test_cols_layout_bn_matches_natural(rng):
    """TorchBatchNorm(cols_blocks=G) on the channel-padded-columns layout
    must match the natural (..., G, C) orientation — outputs, running mean
    and running var (the eval path consumes the latter two), with the pad
    columns normalizing to exactly zero (models/norm.py)."""
    from dualsuperreslearningforsemseg_tpu.models.norm import TorchBatchNorm
    from dualsuperreslearningforsemseg_tpu.ops.conv import TAIL_COL_BLOCK

    f, g, blk = 19, 4, TAIL_COL_BLOCK
    x_nat = jnp.asarray(
        rng.standard_normal((2, 4, 6, g, f)) * 3.0 + 1.5, jnp.float32)
    x_cols = jnp.pad(x_nat, ((0, 0),) * 4 + ((0, blk - f),)).reshape(2, 4, 6, g * blk)

    bn = TorchBatchNorm(features=f, dtype=jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x_nat, False)

    y_nat, m_nat = bn.apply(variables, x_nat, False, mutable=['batch_stats'])
    y_cols, m_cols = bn.apply(variables, x_cols, False, cols_blocks=g,
                              mutable=['batch_stats'])

    y_cols_back = np.asarray(y_cols).reshape(2, 4, 6, g, blk)
    np.testing.assert_allclose(np.asarray(y_nat), y_cols_back[..., :f],
                               rtol=1e-5, atol=1e-5)
    assert float(np.abs(y_cols_back[..., f:]).max()) == 0.0
    for key in ('running_mean', 'running_var'):
        np.testing.assert_allclose(np.asarray(m_nat['batch_stats'][key]),
                                   np.asarray(m_cols['batch_stats'][key]),
                                   rtol=1e-5, atol=1e-6)
