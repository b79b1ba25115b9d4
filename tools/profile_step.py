"""Capture a jax.profiler trace of the production stage-3 train step.

Usage: python tools/profile_step.py   (writes /tmp/dsrl_trace)
Then:  python tools/xplane_section.py            # per-section breakdown
       python tools/xplane_section.py '' <sec>   # top ops in one section

This is the trace recipe behind the README "Measured performance"
per-section table — run it on the real chip with the persistent compile
cache warm (a full bench.py run warms it)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu.utils.fsutil import compile_cache_dir
    jax.config.update('jax_compilation_cache_dir', compile_cache_dir('tpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from dualsuperreslearningforsemseg_tpu import settings
    from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
    from dualsuperreslearningforsemseg_tpu.data import AugmentConfig, make_device_post_fn
    from dualsuperreslearningforsemseg_tpu.models import DSRL
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh, replicate, batch_sharding
    from dualsuperreslearningforsemseg_tpu.train import sgd_init, make_train_step, TrainState
    from bench import _init_host, BATCH

    stage = 3
    input_hw, output_hw = (256, 512), (512, 1024)
    model = DSRL(stage=stage, num_classes=cs.NUM_CLASSES, dtype=jnp.bfloat16)
    variables = _init_host(model, input_hw, settings.RANDOM_SEED)

    mesh = make_mesh()
    n_chips = len(mesh.devices.reshape(-1))
    state = TrainState(params=replicate(variables['params'], mesh),
                       batch_stats=replicate(variables['batch_stats'], mesh),
                       momentum=replicate(sgd_init(variables['params']), mesh))

    aug_cfg = AugmentConfig(input_hw=input_hw, output_hw=output_hw,
                            mean=cs.MEAN, std=cs.STD)
    post = make_device_post_fn(aug_cfg, dtype=jnp.bfloat16,
                               unshuffle_hi=8 if stage > 1 else 0, mesh=mesh)
    train_step = make_train_step(model, stage=stage, w1=0.1, w2=1.0, momentum=0.9,
                                 weight_decay=0.0005,
                                 ignore_label=cs.IGNORE_CLASS_LABEL, mesh=mesh,
                                 post_fn=post)

    rng = np.random.default_rng(0)
    global_batch = BATCH * n_chips
    imgs = rng.integers(0, 256, size=(global_batch, *output_hw, 3), dtype=np.uint8)
    segs = rng.integers(0, 19, size=(global_batch, *output_hw), dtype=np.uint8)
    segs[:, :4] = 255
    imgs_dev = jax.device_put(imgs, batch_sharding(mesh, 4))
    segs_dev = jax.device_put(segs, batch_sharding(mesh, 3))
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dualsuperreslearningforsemseg_tpu.data.native import labels_g16_t
    labs_dev = jax.device_put(labels_g16_t(segs),
                              NamedSharding(mesh, P(None, 'data')))

    key = jax.random.key(0, impl='rbg' if jax.default_backend() == 'tpu'
                         else 'threefry2x32')
    lr = jnp.float32(0.006)

    def step(state, key):
        key, k_step = jax.random.split(key)
        state, losses = train_step(state, imgs_dev, segs_dev, lr, k_step, labs_dev)
        return state, key, losses

    for i in range(3):
        state, key, losses = step(state, key)
        jax.block_until_ready(losses)
        print("warmup", i, flush=True)

    with jax.profiler.trace('/tmp/dsrl_trace'):
        for _ in range(5):
            state, key, losses = step(state, key)
        jax.block_until_ready(losses)
    print("trace done")


if __name__ == '__main__':
    main()
