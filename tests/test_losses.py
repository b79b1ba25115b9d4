"""Loss parity tests: our jitted losses vs exact PyTorch reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch as t
import torch.nn.functional as F

from dualsuperreslearningforsemseg_tpu.losses import (
    cross_entropy_loss, mse_loss, fa_loss, fa_loss_reference_dense)


def _torch_fa_loss(fm1_nchw, fm2_nchw, subsample=8):
    """Literal transcription of /root/reference/models/losses/FALoss.py
    semantics in torch, used as the golden model."""
    def sim(fm):
        fmn = t.div(fm, t.linalg.norm(fm, ord=2, dim=(2, 3), keepdims=True))
        return t.matmul(t.transpose(fmn, 2, 3), fmn)

    s1 = sim(t.nn.AvgPool2d(subsample)(fm1_nchw))
    s2 = sim(t.nn.AvgPool2d(subsample)(fm2_nchw))
    s1 = t.flatten(s1, start_dim=2, end_dim=3)
    s1 = t.repeat_interleave(s1, repeats=s1.shape[-1], dim=2)
    s2 = t.flatten(s2, start_dim=2, end_dim=3)
    s2 = s2.repeat(1, 1, s2.shape[-1])
    return F.l1_loss(s1, s2, reduction='mean')


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((2, 8, 16, 19), dtype=np.float32)
    target = rng.integers(0, 19, size=(2, 8, 16))
    target[0, :3, :5] = 255  # ignored region

    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target), ignore_index=255))
    theirs = t.nn.CrossEntropyLoss(ignore_index=255)(
        t.from_numpy(np.transpose(logits, (0, 3, 1, 2))), t.from_numpy(target).long()).item()
    assert abs(ours - theirs) < 1e-5


def test_cross_entropy_all_ignored(rng):
    logits = rng.standard_normal((1, 4, 4, 19), dtype=np.float32)
    target = np.full((1, 4, 4), 255)
    assert float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target))) == 0.0


def test_mse_matches_torch(rng):
    a = rng.standard_normal((2, 8, 16, 3), dtype=np.float32)
    b = rng.standard_normal((2, 8, 16, 3), dtype=np.float32)
    ours = float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
    theirs = t.nn.MSELoss()(t.from_numpy(a), t.from_numpy(b)).item()
    assert abs(ours - theirs) < 1e-6


@pytest.mark.parametrize("impl", ['dense', 'sorted'])
@pytest.mark.parametrize("shape", [(2, 32, 64, 1), (1, 16, 16, 2)])
def test_fa_loss_matches_torch_reference(rng, shape, impl):
    fm1 = rng.standard_normal(shape, dtype=np.float32)
    fm2 = rng.standard_normal(shape, dtype=np.float32)

    ours = float(jax.jit(fa_loss, static_argnums=(2, 3))(jnp.asarray(fm1), jnp.asarray(fm2), 8, impl))
    dense = float(fa_loss_reference_dense(jnp.asarray(fm1), jnp.asarray(fm2), 8))
    theirs = _torch_fa_loss(t.from_numpy(np.transpose(fm1, (0, 3, 1, 2))),
                            t.from_numpy(np.transpose(fm2, (0, 3, 1, 2)))).item()
    assert abs(dense - theirs) < 1e-5, "dense transcription drifted from torch"
    assert abs(ours - theirs) < 1e-5, "closed-form differs from reference semantics"


def test_fa_loss_gradients_match_dense(rng):
    """The O(N log N) closed form must have the same gradients as the dense
    O(N^2) construction (they are the same function)."""
    fm1 = jnp.asarray(rng.standard_normal((1, 16, 32, 1), dtype=np.float32))
    fm2 = jnp.asarray(rng.standard_normal((1, 16, 32, 1), dtype=np.float32))

    g_fast = jax.grad(lambda a, b: fa_loss(a, b, 8), argnums=(0, 1))(fm1, fm2)
    g_dense = jax.grad(lambda a, b: fa_loss_reference_dense(a, b, 8), argnums=(0, 1))(fm1, fm2)
    for gf, gd in zip(g_fast, g_dense):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd), rtol=1e-4, atol=1e-5)
