"""Frozen-BN folding: bounded perf exploration (VERDICT r3 #7).

With ``--freeze-batch-norm`` (and in eval) BN is an affine built from
running stats, so it could be folded into the preceding conv's weights at
step-build time.  Rather than plumb a folding pass through every module to
find out whether that wins, this probe measures the UPPER BOUND of the win
directly: a model whose TorchBatchNorm is replaced by identity runs exactly
the op graph a perfectly folded network would run (the affine is gone; the
conv kernels would merely hold different values).  If identity-BN ==
frozen-BN throughput, folding cannot buy anything — the affine is already
fused into the conv epilogue by XLA — and the idea is rejected with numbers.

Run on the real TPU: ``python tools/bn_fold_probe.py [--batch 16]``.
Prints one JSON line with img/s for {frozen-BN, identity-BN} stage-3 train.

MEASURED (v5e, 256x512, bf16, batch 16, 2026-08-19): frozen-BN 279.2 vs
identity-BN 290.9 img/s/chip -> folding's upper bound is +4.2%, and exact
folding cannot reach it: the reference's freeze-BN (`module.eval()`,
/root/reference/command_handlers/train_or_resume.py:379-382) freezes only
the running statistics — BN weight/bias stay TRAINABLE, so the affine op
and its per-channel backward reductions (where the 4.2% lives) must remain.
REJECTED; see README "Measured performance".
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _throughput(identity_bn, batch):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from dualsuperreslearningforsemseg_tpu import settings
    from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
    from dualsuperreslearningforsemseg_tpu.models import DSRL, init_model_host
    from dualsuperreslearningforsemseg_tpu.models import norm, resnet, aspp, dsrl
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh, replicate, batch_sharding
    from dualsuperreslearningforsemseg_tpu.train import sgd_init, make_train_step, TrainState

    class IdentityBN(nn.Module):
        """What a folded conv+BN leaves behind: nothing."""
        features: int
        momentum: float = 0.1
        epsilon: float = 1e-5
        dtype: jnp.dtype = jnp.float32
        axis_name: object = None
        weight_init: object = None

        @nn.compact
        def __call__(self, x, use_running_average, cols_blocks=0):
            return x.astype(self.dtype)

    saved = {}
    mods = (norm, resnet, aspp, dsrl)
    if identity_bn:
        for m in mods:
            if hasattr(m, 'TorchBatchNorm'):
                saved[m] = m.TorchBatchNorm
                m.TorchBatchNorm = IdentityBN
    try:
        input_hw = tuple(settings.MODEL_INPUT_SIZE)
        output_hw = tuple(settings.MODEL_OUTPUT_SIZE)
        model = DSRL(stage=3, num_classes=cs.NUM_CLASSES, dtype=jnp.bfloat16)
        variables = init_model_host(model, input_hw, seed=0)
        mesh = make_mesh()
        n_chips = mesh.devices.size
        state = TrainState(params=replicate(variables['params'], mesh),
                           batch_stats=replicate(variables.get('batch_stats', {}), mesh),
                           momentum=replicate(sgd_init(variables['params']), mesh))
        step = make_train_step(model, stage=3, w1=0.1, w2=1.0, momentum=0.9,
                               weight_decay=5e-4, mesh=mesh,
                               freeze_batch_norm=True)
        rng = np.random.default_rng(0)
        g = batch * n_chips
        img_lo = jax.device_put(
            rng.standard_normal((g, *input_hw, 3)).astype(np.float32),
            batch_sharding(mesh, 4))
        img_hi = jax.device_put(
            rng.standard_normal((g, *output_hw, 3)).astype(np.float32),
            batch_sharding(mesh, 4))
        seg = jax.device_put(
            rng.integers(0, cs.NUM_CLASSES, size=(g, *output_hw)).astype(np.int32),
            batch_sharding(mesh, 3))
        key = jax.random.PRNGKey(7)
        state, losses = step(state, img_lo, img_hi, seg, jnp.float32(1e-3), key)
        jax.block_until_ready(losses['Total'])
        steps = 20
        t0 = time.time()
        for _ in range(steps):
            state, losses = step(state, img_lo, img_hi, seg, jnp.float32(1e-3), key)
        jax.block_until_ready(losses['Total'])
        dt = time.time() - t0
        return steps * g / dt / n_chips
    finally:
        for m, cls in saved.items():
            m.TorchBatchNorm = cls


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=16)
    args = parser.parse_args()
    import jax
    try:
        from dualsuperreslearningforsemseg_tpu.utils.fsutil import compile_cache_dir
        from dualsuperreslearningforsemseg_tpu.utils.backend import resolve_backend
        jax.config.update('jax_compilation_cache_dir',
                          compile_cache_dir(resolve_backend()))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    frozen = _throughput(False, args.batch)
    ident = _throughput(True, args.batch)
    print(json.dumps({
        'frozen_bn_img_per_s_per_chip': round(frozen, 1),
        'identity_bn_img_per_s_per_chip': round(ident, 1),
        'fold_upper_bound_speedup': round(ident / frozen, 4),
        'batch_per_chip': args.batch,
    }))


if __name__ == '__main__':
    main()
