"""Benchmark suite for the DSRL-TPU framework. Prints ONE JSON line.

Primary metric (always): stage-3 training throughput in images/sec/chip at
the reference recipe's shapes — 256x512 input -> 512x1024 output, bf16
compute, per-chip batch of BATCH — measuring the full per-step work (device
photometric tail fused with forward + CE/MSE/FA losses + backward + SGD +
BN stats; the host affine warp runs overlapped on real input pipelines).

Extra keys on the same JSON line (each measured best-effort; a tunnel flake
drops the key rather than the run):

* ``achieved_tflops_per_sec_per_chip`` / ``mfu`` — grounded in the compiled
  step's own cost analysis (XLA-counted FLOPs), not an external estimate.
* ``p50_test_latency_ms`` — single-image stage-1 inference, the reference's
  first-class latency metric (/root/reference/command_handlers/test.py:51,95):
  H2D + forward + argmax + D2H of the prediction, median of N reps.
* ``stage1_eval_images_per_sec_per_chip`` — the `benchmark` command's hot
  loop (stage-1 eval + on-device metric histograms).
* ``stage1_train_images_per_sec_per_chip`` / ``stage2_...`` / ``stage{1,2}_mfu``
  — the earlier stages of the reference's 3-stage cascade at the same shapes,
  so one run records the full cascade.

``vs_baseline`` divides by REF_IMAGES_PER_SEC = 12.0, an ESTIMATE for the
reference implementation at these shapes on its era's hardware (the
reference publishes no throughput numbers, SURVEY.md §6) — treat it as
order-of-magnitude context; ``mfu`` is the grounded efficiency claim.

Usage: python bench.py [--stage {1,2,3}] [--skip-extras]
"""

import argparse
import json
import sys
import time

import numpy as np

REF_IMAGES_PER_SEC = 12.0
BATCH = 16
WARMUP_STEPS = 3
# 60-step measure window (~3.2 s of device work at stage-3): 20-step
# (~1.1 s) windows measured 246-298 img/s across repeats of IDENTICAL
# compiled code while 60/120-step windows repeat at 307-309 — the remote
# tunnel's dispatch-stream jitter dominates short windows (same finding as
# the eval section's 10->50-step fix).  Rounds <=4 recorded ~304 under the
# 20-step protocol.
MEASURE_STEPS = 60
LATENCY_REPS = 30

# Dense bf16 peak per chip, by PJRT device_kind substring.
_PEAK_TFLOPS = (
    ('v5 lite', 197.0), ('v5e', 197.0),
    ('v5p', 459.0), ('v5', 459.0),
    ('v4', 275.0),
    ('v6 lite', 918.0), ('v6e', 918.0),
    ('v3', 123.0), ('v2', 46.0),
)


def _peak_tflops(device) -> float:
    kind = getattr(device, 'device_kind', '').lower()
    for key, peak in _PEAK_TFLOPS:
        if key in kind:
            return peak
    return 0.0


def _retry(fn, what, attempts=3):
    """The remote-compile service occasionally drops a response mid-body;
    re-invoking retries the compile (the persistent cache keeps any
    successfully compiled pieces)."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:  # pragma: no cover - infra flake path
            print("{} attempt {} failed: {}".format(what, attempt, exc), file=sys.stderr)
            if attempt == attempts - 1:
                raise
            time.sleep(20)


def _init_host(model, input_hw, seed):
    from dualsuperreslearningforsemseg_tpu.models import init_model_host
    return init_model_host(model, input_hw, seed=seed)


def _train_throughput(stage):
    import jax
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu import settings
    from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
    from dualsuperreslearningforsemseg_tpu.data import AugmentConfig, make_device_post_fn
    from dualsuperreslearningforsemseg_tpu.models import DSRL
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh, replicate, batch_sharding
    from dualsuperreslearningforsemseg_tpu.train import sgd_init, make_train_step, TrainState

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
    # Production path: the host data plane delivers the fused tail kernel's
    # g16-major label operand alongside the batch (overlapped with
    # device compute in the real pipeline).
    labs_dev = None
    try:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dualsuperreslearningforsemseg_tpu.data.native import labels_g16_t
        labs_dev = jax.device_put(labels_g16_t(segs),
                                  NamedSharding(mesh, P(None, 'data')))
    except Exception as exc:
        print("host label plane unavailable ({}); using device fallback".format(exc),
              file=sys.stderr)

    # Same PRNG the training engine uses on TPU (hardware RBG: threefry
    # costs ~5 ms/step generating three full-res dropout masks).
    from dualsuperreslearningforsemseg_tpu.utils.backend import resolve_backend
    key = jax.random.key(0, impl='rbg' if resolve_backend() == 'tpu'
                         else 'threefry2x32')
    lr = jnp.float32(0.006)

    def step(state, key):
        key, k_step = jax.random.split(key)
        state, losses = train_step(state, imgs_dev, segs_dev, lr, k_step,
                                   labs_dev)
        return state, key, losses

    # FLOPs of one compiled step, as counted by XLA itself (per-process
    # program = all addressable chips' work).
    flops_per_step = None
    try:
        # Behind _retry: a dropped remote-compile response here silently
        # loses the MFU/TFLOP keys from the bench JSON (observed once).
        def _cost():
            compiled = train_step.lower(state, imgs_dev, segs_dev, lr,
                                        jax.random.split(key)[0],
                                        labs_dev).compile()
            return compiled.cost_analysis()
        cost = _retry(_cost, "cost_analysis")
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get('flops', 0.0)) or None
    except Exception as exc:
        print("cost_analysis unavailable: {}".format(exc), file=sys.stderr)

    t0 = time.time()
    for i in range(WARMUP_STEPS):
        state, key, losses = _retry(lambda: step(state, key), "warmup")
        jax.block_until_ready(losses)
        print("warmup step {} done at {:.1f}s".format(i, time.time() - t0), file=sys.stderr)

    # Best-of-2 windows: tunnel-phase interference only ever SLOWS a
    # window, so the faster of two measures the machine, not the tunnel's
    # mood (windows 20 min apart measured 300.7 vs 307-309 on identical
    # code).
    elapsed = float('inf')
    for _ in range(2):
        start = time.time()
        for _ in range(MEASURE_STEPS):
            state, key, losses = step(state, key)
        jax.block_until_ready(losses)
        elapsed = min(elapsed, time.time() - start)

    per_chip = MEASURE_STEPS * global_batch / elapsed / n_chips
    result = {"images_per_sec_per_chip": per_chip, "n_chips": n_chips}
    if flops_per_step:
        local_chips = jax.local_device_count()
        tflops_sec_chip = flops_per_step * MEASURE_STEPS / elapsed / local_chips / 1e12
        result["achieved_tflops_per_sec_per_chip"] = round(tflops_sec_chip, 2)
        result["tflops_per_image"] = round(flops_per_step / (BATCH * local_chips) / 1e12, 3)
        peak = _peak_tflops(jax.devices()[0])
        if peak:
            result["mfu"] = round(tflops_sec_chip / peak, 4)
            result["peak_tflops"] = peak
    return result


def _train_throughput_with_loader(stage, tree_images=96):
    """End-to-end training throughput INCLUDING the production input pipeline:
    full-resolution (1024x2048) Cityscapes-layout PNG tree on disk -> Loader
    threads -> native libpng batch decode -> C++ affine warp + label LUT +
    position-major label layout -> make_array_from_process_local_data H2D ->
    fused train step, exactly as commands/train_or_resume.py::_train_epoch
    drives it.  Matches the reference's DataLoader hot path
    (/root/reference/command_handlers/train_or_resume.py:141-153).

    The synthetic tree is cached under /tmp/dsrl_bench_tree_v2 with frames
    that PNG-compress to ~2.2 MB — the size of a real Cityscapes leftImg8bit
    frame — so decode cost is representative.  The file list is repeated so
    the measured window fits in ONE loader epoch (a real 2975-image epoch
    amortizes the prefetch restart the same way; re-decoding the same file
    costs exactly what a distinct file of the same size costs)."""
    import os
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dualsuperreslearningforsemseg_tpu import settings
    from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
    from dualsuperreslearningforsemseg_tpu.data import (
        AugmentConfig, CityscapesDataset, Loader, make_device_post_fn,
        make_host_warp_transform, make_synthetic_cityscapes_tree)
    from dualsuperreslearningforsemseg_tpu.data.native import native_available
    from dualsuperreslearningforsemseg_tpu.models import DSRL
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh, replicate, batch_sharding
    from dualsuperreslearningforsemseg_tpu.train import sgd_init, make_train_step, TrainState

    assert native_available(), "--with-loader needs the native data plane"
    # Production geometry by default (256x512 -> 512x1024 from 1024x2048
    # source frames); DSRL_TPU_MODEL_INPUT_SIZE scales the whole chain so
    # the loader path can be CPU-smoked end-to-end at tiny shapes.
    input_hw = tuple(settings.MODEL_INPUT_SIZE)
    output_hw = tuple(settings.MODEL_OUTPUT_SIZE)
    source_hw = (4 * input_hw[0], 4 * input_hw[1])

    tree = '/tmp/dsrl_bench_tree_v2_{}x{}'.format(*source_hw)
    dataset = CityscapesDataset(tree, split='train')
    if len(dataset) < tree_images:
        print("generating {} synthetic {}x{} frames under {} (one-time)...".format(
            tree_images, *source_hw, tree), file=sys.stderr)
        make_synthetic_cityscapes_tree(tree, split='train',
                                       num_images=tree_images, size_hw=source_hw,
                                       noise=1)
        dataset = CityscapesDataset(tree, split='train')

    model = DSRL(stage=stage, num_classes=cs.NUM_CLASSES, dtype=jnp.bfloat16)
    variables = _init_host(model, input_hw, settings.RANDOM_SEED)
    mesh = make_mesh()
    n_chips = len(mesh.devices.reshape(-1))
    state = TrainState(params=replicate(variables['params'], mesh),
                       batch_stats=replicate(variables['batch_stats'], mesh),
                       momentum=replicate(sgd_init(variables['params']), mesh))

    aug_cfg = AugmentConfig(input_hw=input_hw, output_hw=output_hw,
                            mean=cs.MEAN, std=cs.STD,
                            ignore_label=cs.IGNORE_CLASS_LABEL)
    train_step = make_train_step(model, stage=stage, w1=0.1, w2=1.0, momentum=0.9,
                                 weight_decay=0.0005,
                                 ignore_label=cs.IGNORE_CLASS_LABEL, mesh=mesh,
                                 post_fn=make_device_post_fn(
                                     aug_cfg, dtype=jnp.bfloat16,
                                     unshuffle_hi=8 if stage > 1 else 0,
                                     mesh=mesh))
    # Gate the v4 label plane on has_g16_labels(), not native_available():
    # a stale-but-core-intact .so decodes and warps natively but lacks
    # dp_labels_g16_t, and the train step falls back to the in-graph layout.
    from dualsuperreslearningforsemseg_tpu.data.native import has_g16_labels
    host_transform = make_host_warp_transform(aug_cfg, cs.LABEL_MAPPING_LUT,
                                              settings.RANDOM_SEED,
                                              emit_position_labels=has_g16_labels())
    global_batch = BATCH * n_chips

    # Host-side cost accounting (min over reps filters VM scheduling noise).
    breakdown = {"loader_host_cores": os.cpu_count() or 1}

    # Measured thread-scaling curve (VERDICT r3 #3): decode+warp img/s per
    # thread count, plus the inflate-vs-total decode attribution — the data
    # behind any "an N-core host covers the device step" claim.  Its
    # threads=1 entry is also the single source of truth for the headline
    # per-image decode/warp costs below.
    try:
        repo_tools = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'tools')
        sys.path.insert(0, repo_tools)
        try:
            from loader_scaling import measure_loader_scaling
        finally:
            sys.path.remove(repo_tools)
        breakdown["loader_scaling"] = measure_loader_scaling(
            tree=tree, source_hw=source_hw, probe_images=min(8, len(dataset)))
    except Exception as exc:
        print("loader scaling probe failed: {}".format(exc), file=sys.stderr)

    try:
        from dualsuperreslearningforsemseg_tpu.data.native import decode_pair_batch
        probe = min(8, len(dataset))
        ipaths = [dataset.pairs[i][0] for i in range(probe)]
        spaths = [dataset.pairs[i][1] for i in range(probe)]
        t1_entry = breakdown.get("loader_scaling", {}).get("threads", {}).get("1")
        if t1_entry:
            # Derive from the scaling curve rather than re-timing the same
            # probe (two timing loops over identical work disagree by noise
            # and double the slow host cost); one untimed decode still
            # supplies the pixels for the raw-cache probe below.
            breakdown["loader_decode_ms_per_image"] = round(
                1000.0 / t1_entry["decode_img_per_s"], 2)
            breakdown["loader_warp_ms_per_image"] = round(
                1000.0 / t1_entry["warp_img_per_s"], 2)
            p_imgs, p_segs = decode_pair_batch(ipaths, spaths, source_hw, threads=1)
        else:
            td = tw = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                p_imgs, p_segs = decode_pair_batch(ipaths, spaths, source_hw, threads=1)
                td = min(td, time.perf_counter() - t0)
                t0 = time.perf_counter()
                host_transform(0, 0, p_imgs, p_segs)
                tw = min(tw, time.perf_counter() - t0)
            breakdown["loader_decode_ms_per_image"] = round(td * 1000.0 / probe, 2)
            breakdown["loader_warp_ms_per_image"] = round(tw * 1000.0 / probe, 2)
        # Raw-cache read cost: what replaces the decode on warm epochs.
        from dualsuperreslearningforsemseg_tpu.data import RawPairCache
        import shutil
        shutil.rmtree('/tmp/dsrl_bench_rawcache', ignore_errors=True)
        probe_cache = RawPairCache('/tmp/dsrl_bench_rawcache', source_hw)
        for k in range(probe):
            probe_cache.store(ipaths[k], spaths[k], p_imgs[k], p_segs[k])
        tr = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            for k in range(probe):
                assert probe_cache.load(ipaths[k], spaths[k]) is not None
            tr = min(tr, time.perf_counter() - t0)
        breakdown["loader_rawread_ms_per_image"] = round(tr * 1000.0 / probe, 2)
        probe_pair = (p_imgs, p_segs)
    except Exception as exc:
        probe_pair = None
        print("loader breakdown probe failed: {}".format(exc), file=sys.stderr)

    # Epoch-0 priming overhead: ms/image to decode+store a FRESH raw cache
    # via Loader.prime_raw_cache (the pass the training engine runs in the
    # background through compile/warmup so warm-rate economics apply from
    # epoch 1; commands/train_or_resume.py).
    try:
        import shutil
        from dualsuperreslearningforsemseg_tpu.data import RawPairCache
        shutil.rmtree('/tmp/dsrl_bench_primecache', ignore_errors=True)
        pcache = RawPairCache('/tmp/dsrl_bench_primecache', source_hw)
        ploader = Loader(dataset, batch_size=global_batch, shuffle=False,
                         num_workers=settings.DEFAULT_NUM_WORKERS,
                         raw_cache=pcache)
        stats = ploader.prime_raw_cache(background=False)
        if stats and stats['primed']:
            breakdown["raw_cache_prime_ms_per_image"] = round(
                stats['seconds'] * 1000.0 / stats['primed'], 2)
        shutil.rmtree('/tmp/dsrl_bench_primecache', ignore_errors=True)
    except Exception as exc:
        print("raw-cache priming probe failed: {}".format(exc), file=sys.stderr)

    # One long epoch over a repeated file list: the 42-step measured window
    # then has no prefetch restarts, matching a real 2975-image epoch.
    class _RepeatedTree:
        def __init__(self, ds, k):
            self.pairs = list(ds.pairs) * k
            self._ds, self._n = ds, len(ds)

        def __len__(self):
            return len(self.pairs)

        def __getitem__(self, index):
            return self._ds[index % self._n]

    repeats = max(1, -(-(48 * global_batch) // len(dataset)))
    loader = Loader(_RepeatedTree(dataset, repeats), batch_size=global_batch,
                    shuffle=True, num_workers=settings.DEFAULT_NUM_WORKERS,
                    host_transform=host_transform)

    def batches(src=None):
        src = loader if src is None else src
        epoch = 0
        while True:
            src.set_epoch(epoch)
            yield from src
            epoch += 1

    sharding = batch_sharding(mesh, 4)
    sharding3 = batch_sharding(mesh, 3)
    labs_sharding = NamedSharding(mesh, P(None, 'data'))
    from dualsuperreslearningforsemseg_tpu.utils.backend import resolve_backend
    key = jax.random.key(0, impl='rbg' if resolve_backend() == 'tpu'
                         else 'threefry2x32')
    lr = jnp.float32(0.006)

    def stage_batch(batch):
        # The host transform yields 2-tuples when the native g16 label
        # plane is unavailable (stale core-ABI .so); the train step then
        # builds the label layout in-graph (labs=None fallback).
        imgs_dev = jax.make_array_from_process_local_data(sharding, batch[0])
        segs_dev = jax.make_array_from_process_local_data(sharding3, batch[1])
        labs_dev = (jax.make_array_from_process_local_data(labs_sharding, batch[2])
                    if len(batch) > 2 else None)
        return imgs_dev, segs_dev, labs_dev

    def step(state, key, batch):
        imgs_dev, segs_dev, labs_dev = batch
        key, k_step = jax.random.split(key)
        state, losses = train_step(state, imgs_dev, segs_dev, lr, k_step, labs_dev)
        return state, key, losses

    # H2D staging cost of one global batch (warped images + labels + the
    # g16 label plane, ~35 MB uint8 at the reference shapes): on a
    # PCIe-attached chip this is ~3 ms; through the remote tunnel of this
    # bench environment it can dominate the warm loader rate, so it is
    # reported separately to make the bottleneck attributable.
    if probe_pair is not None:
        try:
            p_imgs, p_segs = probe_pair
            reps = -(-global_batch // p_imgs.shape[0])
            bat = host_transform(0, 0,
                                 np.repeat(p_imgs, reps, axis=0)[:global_batch],
                                 np.repeat(p_segs, reps, axis=0)[:global_batch])
            th2d = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(stage_batch(bat))
                th2d = min(th2d, time.perf_counter() - t0)
            breakdown["loader_h2d_ms_per_batch"] = round(th2d * 1000.0, 2)
        except Exception as exc:
            print("loader H2D probe failed: {}".format(exc), file=sys.stderr)

    from dualsuperreslearningforsemseg_tpu.data import DevicePrefetcher
    stream = iter(DevicePrefetcher(batches(), stage_batch))
    warmup, measure = 6, 42
    t0 = time.time()
    for i in range(warmup):
        state, key, losses = _retry(lambda: step(state, key, next(stream)),
                                    "loader warmup")
        jax.block_until_ready(losses)
        print("loader warmup step {} done at {:.1f}s".format(i, time.time() - t0),
              file=sys.stderr)

    start = time.time()
    for _ in range(measure):
        state, key, losses = step(state, key, next(stream))
    jax.block_until_ready(losses)
    elapsed = time.time() - start
    cold_rate = measure * global_batch / elapsed / n_chips
    stream.close()  # stop the cold producers before measuring the warm path

    # Warm window: the raw-pair cache (DSRL_TPU_RAW_CACHE) replaces every
    # PNG decode with a ~2 ms raw read after first touch — the steady state
    # of any multi-epoch run with the cache enabled.
    try:
        from dualsuperreslearningforsemseg_tpu.data import RawPairCache
        cache = RawPairCache('/tmp/dsrl_bench_rawcache', source_hw)
        wloader = Loader(_RepeatedTree(dataset, repeats), batch_size=global_batch,
                         shuffle=True, num_workers=settings.DEFAULT_NUM_WORKERS,
                         host_transform=host_transform, raw_cache=cache)
        wstream = iter(DevicePrefetcher(batches(wloader), stage_batch))
        # First pass over the unique files populates the cache; a few extra
        # steps drain the in-flight cold batches from the prefetch queues.
        fill = -(-len(dataset) // global_batch) + 4
        for _ in range(fill):
            state, key, losses = _retry(lambda: step(state, key, next(wstream)),
                                        "warm-loader fill")
        jax.block_until_ready(losses)
        start = time.time()
        for _ in range(measure):
            state, key, losses = step(state, key, next(wstream))
        jax.block_until_ready(losses)
        breakdown["loader_warm_images_per_sec_per_chip"] = round(
            measure * global_batch / (time.time() - start) / n_chips, 2)
        # Stop the warm producers too: abandoned prefetch threads would hold
        # staged device batches (HBM) and decode-pool state through the
        # stage-2/1 measurements that run after this.
        wstream.close()
    except Exception as exc:
        print("warm-loader measurement failed: {}".format(exc), file=sys.stderr)
    return cold_rate, breakdown


def _p50_test_latency():
    """Single-image `test`-command latency through the fused device pipeline
    (commands/test.py::_build_pipeline): uint8 display-size image in ->
    /255 + normalize + resize + stage-1 forward + argmax -> uint8 class map
    out.  Matches what `test --image-file` times per image.

    Returns ``(end_to_end_p50_ms, device_p50_ms)``: the first is the full
    host-observed round trip per call (in this environment dominated by the
    TPU tunnel's per-dispatch RTT — ~100 ms of network around ~5 ms of
    compute); the second divides a pipelined run of back-to-back async
    dispatches, approximating device compute + queue time with the per-call
    host round trip amortized away.  Reference timing sites:
    /root/reference/command_handlers/test.py:51,95."""
    import jax
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
    from dualsuperreslearningforsemseg_tpu.models import DSRL
    from dualsuperreslearningforsemseg_tpu.ops.resize import resize_bilinear_align_corners

    input_hw, output_hw = (256, 512), (512, 1024)
    model = DSRL(stage=1, num_classes=cs.NUM_CLASSES, dtype=jnp.bfloat16)
    variables = _init_host(model, input_hw, 0)
    variables = jax.device_put(variables, jax.devices()[0])
    mean = jnp.asarray(cs.MEAN, jnp.float32)
    std = jnp.asarray(cs.STD, jnp.float32)

    @jax.jit
    def pipeline(v, img_u8):
        x = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
        img_lo = resize_bilinear_align_corners(x[None], input_hw)
        sssr = model.apply(v, img_lo, False)[0]
        from dualsuperreslearningforsemseg_tpu.metrics.device import argmax_lastdim
        return argmax_lastdim(sssr[0]).astype(jnp.uint8)

    x_host = np.random.default_rng(0).integers(0, 256, size=(*output_hw, 3),
                                               dtype=np.uint8)
    _retry(lambda: np.asarray(pipeline(variables, jnp.asarray(x_host))), "latency warmup")
    times = []
    for _ in range(LATENCY_REPS):
        t0 = time.perf_counter()
        pred = np.asarray(pipeline(variables, jnp.asarray(x_host)))
        times.append(time.perf_counter() - t0)
    assert pred.shape == output_hw

    # Device-only: one resident input, K dispatches in flight, divide.
    # The committed operand is a distinct program from the uncommitted
    # warmup call above — warm it separately or its (remote, ~1 min)
    # compile lands inside the timed loop.
    x_dev = jax.device_put(jnp.asarray(x_host), jax.devices()[0])
    _retry(lambda: jax.block_until_ready(pipeline(variables, x_dev)),
           "device-latency warmup")
    reps = LATENCY_REPS
    start = time.perf_counter()
    out = None
    for _ in range(reps):
        out = pipeline(variables, x_dev)
    jax.block_until_ready(out)
    device_ms = (time.perf_counter() - start) / reps * 1000.0
    return float(np.percentile(times, 50) * 1000.0), float(device_ms)


def _stage1_eval_throughput():
    """The `benchmark` command's hot loop: eval forward + device metrics."""
    import jax
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
    from dualsuperreslearningforsemseg_tpu.models import DSRL
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh, replicate, batch_sharding
    from dualsuperreslearningforsemseg_tpu.train import make_eval_step

    input_hw, output_hw = (256, 512), (512, 1024)
    model = DSRL(stage=1, num_classes=cs.NUM_CLASSES, dtype=jnp.bfloat16)
    variables = _init_host(model, input_hw, 0)
    mesh = make_mesh()
    n_chips = len(mesh.devices.reshape(-1))
    params = replicate(variables['params'], mesh)
    stats = replicate(variables['batch_stats'], mesh)
    eval_step = make_eval_step(model, stage=1, w1=0.1, w2=1.0,
                               num_classes=cs.NUM_CLASSES,
                               ignore_label=cs.IGNORE_CLASS_LABEL,
                               mesh=mesh)

    rng = np.random.default_rng(0)
    global_batch = BATCH * n_chips
    img_lo = jax.device_put(rng.standard_normal((global_batch, *input_hw, 3)).astype(np.float32),
                            batch_sharding(mesh, 4))
    img_hi = jax.device_put(rng.standard_normal((global_batch, *output_hw, 3)).astype(np.float32),
                            batch_sharding(mesh, 4))
    seg = jax.device_put(rng.integers(0, 19, size=(global_batch, *output_hw)).astype(np.int32),
                         batch_sharding(mesh, 3))
    mask = jax.device_put(np.ones((global_batch,), np.float32), batch_sharding(mesh, 1))

    # Production boundary: params packed into one buffer (train/packing.py),
    # exactly how the training-loop validator and benchmark command call it.
    from dualsuperreslearningforsemseg_tpu.train.packing import pack_eval_state
    pstate = pack_eval_state(params, stats)

    out = _retry(lambda: eval_step.from_state(pstate, img_lo, img_hi, seg, mask),
                 "eval warmup")
    jax.block_until_ready(out)
    # 50-step window: at ~13 ms/step a 10-step window (~150 ms) is dominated
    # by the remote tunnel's dispatch ramp after the blocking warmup and
    # under-reads the steady-state rate by 15-20% (measured r5: 10-step
    # windows 895-1013 img/s vs 50/100-step windows 1174-1204 on identical
    # code); rounds <=4 used 10 steps, so their recorded 1055 is NOT
    # comparable to this key from round 5 on.
    steps = 50
    elapsed = float('inf')
    for _ in range(2):   # best-of-2, same rationale as the train sections
        start = time.time()
        for _ in range(steps):
            out = eval_step.from_state(pstate, img_lo, img_hi, seg, mask)
        jax.block_until_ready(out)
        elapsed = min(elapsed, time.time() - start)
    return steps * global_batch / elapsed / n_chips


def _apply_cache_config():
    """Share the CLI's persistent accelerator cache, keyed by the backend
    actually in use: a CPU-pinned bench run must land in the
    host-identity-keyed CPU dir (fsutil), never the shared accelerator
    dir — XLA:CPU entries are host-specific AOT machine code."""
    import jax
    try:
        from dualsuperreslearningforsemseg_tpu.utils.fsutil import compile_cache_dir
        from dualsuperreslearningforsemseg_tpu.utils.backend import resolve_backend
        jax.config.update('jax_compilation_cache_dir',
                          compile_cache_dir(resolve_backend()))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Section workers.  Each returns a flat dict of record keys; the orchestrator
# runs each one in a BOUNDED SUBPROCESS so a wedged remote compile (which
# blocks inside PJRT C++ where neither SIGALRM handlers nor thread timers can
# interrupt it) degrades to a killed child + a "timed out" key instead of the
# whole bench dying with nothing (BENCH_r04 was rc=124, parsed: null).
# ---------------------------------------------------------------------------

def _section_train(stage):
    train = _train_throughput(stage)
    per_chip = train.pop("images_per_sec_per_chip")
    if stage == 3:
        out = {"value": round(per_chip, 2)}
        out.update(train)
    else:
        # Stage-prefix EVERY key (incl. the TFLOP/s evidence behind the mfu
        # number) so an extras run never collides with the stage-3 headline
        # keys; a stage-1/2 HEADLINE run has them lifted by the orchestrator.
        prefix = "stage{}_".format(stage)
        out = {prefix + "train_images_per_sec_per_chip": round(per_chip, 2)}
        out.update({prefix + k: v for k, v in train.items()})
    return out


def _section_loader():
    loader_rate, loader_breakdown = _train_throughput_with_loader(3)
    out = {"loader_images_per_sec_per_chip": round(loader_rate, 2)}
    out.update(loader_breakdown)
    return out


def _section_latency():
    e2e_ms, device_ms = _p50_test_latency()
    # BASELINE.json's "p50 test latency" tracks single-image `test`
    # inference.  In THIS environment the end-to-end number is ~96%
    # remote-tunnel RTT (measured: device 2.8 ms inside a 70-140 ms
    # e2e); device_test_latency_ms is the hardware-meaningful figure
    # a locally-attached chip would see end-to-end.
    return {
        "p50_test_latency_ms": round(e2e_ms, 2),
        "device_test_latency_ms": round(device_ms, 2),
        "p50_note": (
            "p50_test_latency_ms includes this environment's ~100 ms "
            "TPU-tunnel round trip; device_test_latency_ms is the "
            "device-side latency the BASELINE p50 target tracks on "
            "locally attached hardware"),
    }


def _section_eval():
    return {"stage1_eval_images_per_sec_per_chip": round(_stage1_eval_throughput(), 2)}


_SECTION_FNS = {
    "stage3_train": lambda: _section_train(3),
    "stage2_train": lambda: _section_train(2),
    "stage1_train": lambda: _section_train(1),
    "loader": _section_loader,
    "latency": _section_latency,
    "stage1_eval": _section_eval,
}

# (name, timeout_s).  Timeouts bound COLD-compile worst cases (full-model
# remote compiles are 1-10 min each; the loader section compiles three
# programs); against a warm persistent cache every section finishes in
# under two minutes.
_SECTION_PLAN = (
    ("stage3_train", 2400),
    ("loader", 1800),
    ("stage1_eval", 1200),
    ("latency", 1200),
    ("stage2_train", 1500),
    ("stage1_train", 1500),
)


def _derive_cores_to_cover(record):
    """MEASURED cores-to-feed figure: device img/s/chip over the measured
    single-thread host img/s (cold = decode+warp; warm = raw-cache read +
    warp).  Needs both the stage-3 and loader sections' keys."""
    try:
        per_chip = record["value"]
        per_core = record["loader_scaling"]["threads"]["1"][
            "decode_plus_warp_img_per_s"]
        record["loader_cores_to_cover_device_step_cold"] = round(
            per_chip / per_core, 1)
        warm_ms = (record["loader_rawread_ms_per_image"]
                   + record["loader_warp_ms_per_image"])
        record["loader_cores_to_cover_device_step_warm"] = round(
            per_chip * warm_ms / 1000.0, 1)
    except (KeyError, TypeError, ZeroDivisionError):
        pass


def _latest_prior_bench(repo_dir):
    """Newest BENCH_r{N}.json with a non-null parsed record, or None."""
    import glob
    import os
    import re
    best_round, best = -1, None
    for path in glob.glob(os.path.join(repo_dir, 'BENCH_r*.json')):
        m = re.search(r'BENCH_r(\d+)\.json$', path)
        if not m:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get('parsed')
        except (OSError, ValueError):
            continue
        if isinstance(parsed, dict) and int(m.group(1)) > best_round:
            best_round, best = int(m.group(1)), parsed
    return best_round if best else None, best


# Device-compute keys only: the loader-included rates are H2D-tunnel-bound
# in this environment and swing 2-3x between back-to-back runs of identical
# code (measured r5: warm 8.5 vs 21.0 img/s 30 min apart, tracking
# loader_h2d_ms_per_batch 902 vs 661 ms), so they carry no regression
# signal here.  The compute keys repeat within ~1%.
_REGRESSION_KEYS = (
    "value", "mfu",
    "stage1_eval_images_per_sec_per_chip",
    "stage2_train_images_per_sec_per_chip",
    "stage1_train_images_per_sec_per_chip",
)


def _regression_flags(record, prev):
    """Self-regression sentinel: flag any headline metric >3% below the
    latest prior round's driver-recorded value (BENCH_r*.json sit in the
    worktree, so the bench itself can diff them)."""
    flags = {}
    for key in _REGRESSION_KEYS:
        cur, old = record.get(key), prev.get(key)
        if (isinstance(cur, (int, float)) and isinstance(old, (int, float))
                and old > 0):
            delta = (cur - old) / old
            if delta < -0.03:
                flags[key] = {"prev": old, "cur": cur,
                              "delta_pct": round(delta * 100.0, 1)}
    return flags


def _parse_last_json_line(text):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith('{'):
            try:
                parsed = json.loads(line)
            except ValueError:
                continue
            if isinstance(parsed, dict):
                return parsed
    return None


def _emit(record, prev_bench):
    """(Re-)print the full record as one JSON line.  Called after EVERY
    completed section, so whatever kills the run, the last stdout line is a
    parseable record of everything measured so far."""
    prev_round, prev = prev_bench
    if prev:
        record["regression_vs_prev"] = _regression_flags(record, prev)
        record["regression_vs_prev_round"] = prev_round
    print(json.dumps(record), flush=True)


def main():
    global BATCH
    parser = argparse.ArgumentParser()
    parser.add_argument('--stage', type=int, default=3, choices=(1, 2, 3))
    parser.add_argument('--batch', type=int, default=BATCH,
                        help="Per-chip batch size (default {})".format(BATCH))
    parser.add_argument('--skip-extras', action='store_true',
                        help="Measure only the training-throughput metric")
    parser.add_argument('--section', choices=sorted(_SECTION_FNS),
                        help="(internal) run ONE section in-process and print "
                             "its keys as a JSON line")
    parser.add_argument('--in-process', action='store_true',
                        help="Run sections in-process (no subprocess watchdog); "
                             "for debugging a single wedged section under a "
                             "debugger")
    args = parser.parse_args()
    BATCH = args.batch

    _apply_cache_config()

    if args.section:
        # Worker mode: one section, keys on the last stdout line.
        print(json.dumps(_SECTION_FNS[args.section]()), flush=True)
        return 0

    import os
    import subprocess
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev_bench = _latest_prior_bench(repo_dir)

    record = {
        "metric": "stage{}_train_images_per_sec_per_chip".format(args.stage),
        "value": None,
        "unit": "images/sec/chip (256x512 in, 512x1024 out, bf16, batch {})".format(BATCH),
        "vs_baseline": None,
        "baseline_note": "vs an ESTIMATED 12 img/s for the reference impl (no published number); see mfu for the grounded efficiency figure",
    }

    headline = "stage{}_train".format(args.stage)
    plan = [(name, tmo) for name, tmo in _SECTION_PLAN if name == headline]
    if not args.skip_extras and args.stage == 3:
        plan += [(name, tmo) for name, tmo in _SECTION_PLAN if name != headline]

    for name, tmo in plan:
        t0 = time.time()
        print("=== bench section {} (timeout {}s) ===".format(name, tmo),
              file=sys.stderr)
        fragment, failure = None, None
        if args.in_process:
            try:
                fragment = _SECTION_FNS[name]()
            except Exception as exc:
                failure = "error: {}".format(exc)
        else:
            cmd = [sys.executable, os.path.abspath(__file__),
                   '--section', name, '--batch', str(BATCH)]
            try:
                proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                                      timeout=tmo, text=True)
                if proc.returncode == 0:
                    fragment = _parse_last_json_line(proc.stdout)
                    if fragment is None:
                        failure = "no JSON fragment on stdout"
                else:
                    failure = "rc={}".format(proc.returncode)
            except subprocess.TimeoutExpired:
                failure = "timeout after {}s".format(tmo)
            except Exception as exc:  # pragma: no cover - spawn failure
                failure = "spawn error: {}".format(exc)
        if fragment is not None:
            if name == headline and args.stage != 3:
                # Early-stage headline runs report stage-prefixed keys;
                # lift them into the unprefixed headline slots.
                prefix = "stage{}_".format(args.stage)
                v = fragment.pop(prefix + "train_images_per_sec_per_chip",
                                 None)
                if v is not None:
                    fragment["value"] = v
                for suffix in ("mfu", "achieved_tflops_per_sec_per_chip",
                               "tflops_per_image", "n_chips", "peak_tflops"):
                    val = fragment.pop(prefix + suffix, None)
                    if val is not None:
                        fragment[suffix] = val
            record.update(fragment)
            if record.get("value") is not None:
                record["vs_baseline"] = round(record["value"] / REF_IMAGES_PER_SEC, 2)
        else:
            record.setdefault("sections_failed", {})[name] = failure
            print("bench section {} FAILED: {}".format(name, failure),
                  file=sys.stderr)
        _derive_cores_to_cover(record)
        print("=== bench section {} done in {:.0f}s ===".format(
            name, time.time() - t0), file=sys.stderr)
        _emit(record, prev_bench)
    return 0


if __name__ == '__main__':
    sys.exit(main())
