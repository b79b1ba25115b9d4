"""Host input pipeline: threaded decode + device prefetch.

Replaces the reference's multiprocessing DataLoader + DistributedSampler
(/root/reference/command_handlers/train_or_resume.py:141-153) with a
TPU-appropriate design: PIL's C decoder releases the GIL, so a thread pool
(no pickling constraints, no process fork cost) decodes PNG pairs into
batched uint8 numpy arrays while the device trains; batches are transferred
asynchronously and transformed on device by the jitted augment function.  A
prefetch depth of 2 keeps the H2D copy and the train step overlapped.

``ShardedSampler`` reproduces the reference's
``DistributedSampler(shuffle=True, seed, drop_last=True)`` semantics: an
epoch-seeded global permutation, padded/truncated to a multiple of the world
size, then strided by rank — so multi-host runs see disjoint shards with
identical ordering law.
"""

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class ShardedSampler:
    def __init__(self, num_samples, world_size=1, rank=0, shuffle=True,
                 seed=54321, drop_last=True):
        self.num_samples = num_samples
        self.world_size = world_size
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last

    def indices_for_epoch(self, epoch: int):
        """Per-rank sample indices.  ``drop_last=False`` pads the global
        order CYCLICALLY up to a world-size multiple (equal shard lengths on
        every rank — unequal lengths deadlock collective evaluation), and
        marks each pad entry as ``-(index + 1)``: the Loader decodes the
        duplicate for shape uniformity but reports it invalid, so padded
        samples are masked out of every loss and metric instead of being
        double-counted (torch's DistributedSampler double-counts here)."""
        if self.shuffle:
            g = np.random.default_rng(self.seed + epoch)
            order = g.permutation(self.num_samples)
        else:
            order = np.arange(self.num_samples)
        if self.drop_last:
            usable = (len(order) // self.world_size) * self.world_size
            order = order[:usable]
        else:
            pad = self.pad_count()
            if pad:
                # Cyclic fill handles num_samples < world_size too.
                fill = np.resize(order, pad)
                order = np.concatenate([order, -(fill + 1)])
        return order[self.rank::self.world_size]

    def pad_count(self) -> int:
        return 0 if self.drop_last else (-self.num_samples) % self.world_size

    def shard_len(self) -> int:
        """len(indices_for_epoch(e)) for any epoch, O(1)."""
        if self.drop_last:
            return self.num_samples // self.world_size
        return (self.num_samples + self.pad_count()) // self.world_size


def _pump(produce, maxsize):
    """The producer/consumer liveness protocol both pipeline stages share.

    Runs ``produce(emit, stop)`` on a daemon thread and yields everything it
    emits.  The discipline lives HERE, once: on normal completion a ``None``
    sentinel is enqueued; any exception (including from a generator's
    ``close()``) is forwarded and re-raised in the consumer; on consumer
    exit ``stop`` is set and the queue drained so a producer blocked on a
    full queue can observe it and die — the consumer never blocks on a dead
    worker, and the worker never outlives an abandoned consumer."""
    out_q = queue.Queue(maxsize=maxsize)
    stop = threading.Event()

    def worker():
        try:
            produce(out_q.put, stop)
            out_q.put(None)
        except BaseException as exc:  # noqa: BLE001 — forwarded, not hidden
            if not stop.is_set():
                out_q.put(exc)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = out_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while thread.is_alive():
            try:
                out_q.get_nowait()
            except queue.Empty:
                thread.join(timeout=0.1)


class DevicePrefetcher:
    """Stage host batches onto the device ahead of consumption.

    Wraps an iterable of host batches with a worker thread that applies
    ``put_fn`` (the H2D staging function — typically a few
    ``jax.make_array_from_process_local_data`` calls) ``depth`` batches
    ahead of the consumer.  The transfers then overlap the device compute
    of the *previous* step instead of serializing with step dispatch on
    the consumer thread — the reference gets the same overlap from
    DataLoader's pinned-memory + ``non_blocking`` copies
    (/root/reference/command_handlers/train_or_resume.py:141-153).

    Exceptions in ``put_fn`` (or the underlying iterator) are forwarded to
    the consumer, and the consumer never blocks on a dead worker — the
    same discipline as ``Loader``.
    """

    def __init__(self, host_iter, put_fn, depth=2):
        self.host_iter = host_iter
        self.put_fn = put_fn
        self.depth = depth

    def __iter__(self):
        def produce(emit, stop):
            it = iter(self.host_iter)
            try:
                for batch in it:
                    if stop.is_set():
                        return
                    staged = self.put_fn(batch)
                    if stop.is_set():
                        return
                    emit(staged)
            finally:
                # A raising close() propagates into _pump's forwarding —
                # it must surface like any other producer failure.
                close = getattr(it, 'close', None)
                if close is not None:
                    close()

        return _pump(produce, maxsize=self.depth)


class Loader:
    """Iterable over batches of decoded samples.

    Each iteration yields ``(images_u8 (B,H,W,3), segs_u8 (B,H,W))`` host
    arrays; the caller applies the jitted device transform.  Images of
    non-uniform size raise — Cityscapes is uniform 1024x2048.
    """

    def __init__(self, dataset, batch_size, shuffle=True, seed=54321,
                 drop_last=True, num_workers=4, world_size=1, rank=0,
                 prefetch=2, use_native=True, host_transform=None,
                 raw_cache=None):
        # host_transform(epoch, batch_index, imgs_u8, segs_u8) -> (imgs, segs)
        # runs inside the decode thread pool (e.g. the native affine warp).
        self.host_transform = host_transform
        # raw_cache: a data.raw_cache.RawPairCache — decoded pairs are
        # served from local disk after first touch (PNG decode is the
        # dominant host cost; see raw_cache.py).  'env' resolves from
        # DSRL_TPU_RAW_CACHE once the decode geometry is known.
        self.raw_cache = None
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = ShardedSampler(len(dataset), world_size, rank, shuffle,
                                      seed, drop_last)
        self.drop_last = drop_last
        # Decode jobs are CPU-bound native code, so concurrency beyond the
        # core count only thrashes (measured 2x slower on a 1-core host);
        # clamp the job pool and split the cores among concurrent jobs for
        # the per-call native thread count.
        cores = os.cpu_count() or 4
        self.num_workers = max(1, min(num_workers, cores))
        self.native_threads = max(1, cores // self.num_workers)
        # The transform runs inside the same pool: hand it the per-worker
        # budget so its own native calls don't multiply it back up.
        if host_transform is not None and hasattr(host_transform, 'set_native_threads'):
            host_transform.set_native_threads(self.native_threads)
        self.prefetch = prefetch
        self.epoch = 0
        # Native C++ batch decode (threaded libpng) when the dataset exposes
        # file pairs and the shared library is available; PIL otherwise.
        self._native_hw = None
        if use_native and hasattr(dataset, 'pairs') and len(dataset) > 0:
            from .native import native_available
            if native_available():
                from PIL import Image as _Image
                with _Image.open(dataset.pairs[0][0]) as im:
                    self._native_hw = (im.height, im.width)
        if raw_cache is not None and hasattr(dataset, 'pairs') and len(dataset) > 0:
            # Cache geometry: reuse the native probe's answer; only open the
            # first image here when the native path didn't already.
            hw = self._native_hw
            if hw is None:
                from PIL import Image as _Image
                with _Image.open(dataset.pairs[0][0]) as im:
                    hw = (im.height, im.width)
            if raw_cache == 'env':
                from .raw_cache import cache_from_env
                self.raw_cache = cache_from_env(hw)
            else:
                self.raw_cache = raw_cache

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def prime_raw_cache(self, background=True, batch=8, epoch=0):
        """Decode every still-uncached pair of THIS rank's ``epoch`` shard
        into the raw cache, in that epoch's sampling order (pass the first
        epoch the run will actually read — the training engine's first
        epoch is ``starting_epoch + 1``, and with ``world_size > 1`` each
        epoch's per-rank SHARD differs, not just its order), so warm-epoch
        economics apply from the first epoch instead of the second.

        The win comes from WHEN it runs: started right after loader
        construction, it decodes through the minutes of host-idle model
        compile/warmup time that precede step 1 (the reference's workers
        only ever decode on demand, train_or_resume.py:141-153).  Total
        decode work is conserved — whatever the primer has not reached yet,
        the epoch-1 loader decodes and stores itself; both sides re-check
        the cache per pair and the atomic entry writes make duplicated work
        benign.

        Returns a started daemon ``Thread`` (``background=True``; ``None``
        when no raw cache is configured) or a stats dict
        ``{'primed', 'skipped', 'seconds'}``; the thread records the same
        dict on ``self._prime_stats`` when it finishes.
        """
        if self.raw_cache is None or not hasattr(self.dataset, 'pairs'):
            return None

        def _run():
            import time
            t0 = time.perf_counter()
            primed = 0
            # Ordered dedup of this rank's shard for the given epoch (pad
            # entries map back to their real index).  Presence probes use
            # has() — one stat each; load() would read the whole ~8 MB pair
            # per probe, i.e. the entire cache on every warm start.
            real = dict.fromkeys(
                int(i) if i >= 0 else int(-(i + 1))
                for i in self.sampler.indices_for_epoch(epoch))
            miss = [i for i in real
                    if not self.raw_cache.has(*self.dataset.pairs[i])]
            for start in range(0, len(miss), batch):
                chunk = miss[start:start + batch]
                # The first epoch's loader may have decoded these since the
                # scan; re-check so primer and loader never both decode a
                # pair that is already served.
                chunk = [i for i in chunk
                         if not self.raw_cache.has(*self.dataset.pairs[i])]
                if not chunk:
                    continue
                imgs, segs = self._decode_indices(chunk)
                for k, i in enumerate(chunk):
                    self.raw_cache.store(*self.dataset.pairs[i],
                                         imgs[k], segs[k])
                primed += len(chunk)
            stats = {'primed': primed, 'skipped': len(real) - len(miss),
                     'seconds': round(time.perf_counter() - t0, 2)}
            self._prime_stats = stats
            return stats

        if not background:
            return _run()
        th = threading.Thread(target=_run, daemon=True,
                              name='raw-cache-primer')
        th.start()
        return th

    def __len__(self):
        n = self.sampler.shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches_indices(self, epoch):
        idx = self.sampler.indices_for_epoch(epoch)
        nb = len(idx) // self.batch_size if self.drop_last else \
            (len(idx) + self.batch_size - 1) // self.batch_size
        for b in range(nb):
            yield b, idx[b * self.batch_size:(b + 1) * self.batch_size]

    def _decode_indices(self, real_idx):
        """Decode dataset entries ``real_idx`` into stacked uint8 arrays
        (native batched path with PIL fallback)."""
        if self._native_hw is not None:
            from .native import decode_pair_batch
            img_paths = [self.dataset.pairs[i][0] for i in real_idx]
            seg_paths = [self.dataset.pairs[i][1] for i in real_idx]
            try:
                return decode_pair_batch(img_paths, seg_paths, self._native_hw,
                                         threads=self.native_threads)
            except RuntimeError as exc:
                # Fall through to PIL so one bad file doesn't kill training,
                # but SAY so: a silent demotion re-decodes the batch twice
                # every epoch and hides a corrupt-dataset signal.
                if not getattr(self, '_native_fallback_warned', False):
                    self._native_fallback_warned = True
                    from ..utils.logging import CAUTION
                    print(CAUTION(
                        "native batch decode failed ({}); retrying batches "
                        "that hit this through the slow PIL path. If it "
                        "persists, check the dataset files it names."
                        .format(exc)))
        imgs, segs = [], []
        for i in real_idx:
            img, seg = self.dataset[i]
            imgs.append(img)
            segs.append(seg)
        return np.stack(imgs), np.stack(segs)

    def _decode_indices_cached(self, real_idx):
        """``_decode_indices`` through the raw-pair disk cache: hits are
        read back as raw bytes (~28x cheaper than PNG decode), misses are
        decoded in one batched call and written behind for later epochs."""
        cache = self.raw_cache
        pairs = self.dataset.pairs
        hits = [cache.load(*pairs[i]) for i in real_idx]
        miss = [j for j, h in enumerate(hits) if h is None]
        if not miss:
            return (np.stack([h[0] for h in hits]),
                    np.stack([h[1] for h in hits]))
        m_imgs, m_segs = self._decode_indices([real_idx[j] for j in miss])
        for k, j in enumerate(miss):
            cache.store(*pairs[real_idx[j]], m_imgs[k], m_segs[k])
        h, w = m_imgs.shape[1:3]
        imgs = np.empty((len(real_idx), h, w, 3), np.uint8)
        segs = np.empty((len(real_idx), h, w), np.uint8)
        for j, hit in enumerate(hits):
            if hit is not None:
                imgs[j], segs[j] = hit
        for k, j in enumerate(miss):
            imgs[j], segs[j] = m_imgs[k], m_segs[k]
        return imgs, segs

    def __iter__(self):
        epoch = self.epoch

        def decode_batch(batch_number, batch_idx):
            # drop_last=False pads shards with CYCLIC duplicates marked as
            # -(index + 1) (ShardedSampler): decode the duplicate for shape
            # uniformity, report it invalid so consumers mask it out of
            # every loss and metric.
            valid = (np.asarray(batch_idx) >= 0).astype(np.float32)
            real_idx = [int(i) if i >= 0 else int(-(i + 1)) for i in batch_idx]
            if self.raw_cache is not None:
                imgs, segs = self._decode_indices_cached(real_idx)
            else:
                imgs, segs = self._decode_indices(real_idx)
            if self.host_transform is not None:
                # May return (imgs, segs) or (imgs, segs, extras...) — e.g.
                # the g16-major label operand for the fused tail kernel;
                # yielded through as-is (plus the valid mask in
                # drop_last=False mode).
                out = self.host_transform(epoch, batch_number, imgs, segs)
                return out if self.drop_last else (*out, valid)
            return (imgs, segs) if self.drop_last else (imgs, segs, valid)

        def produce(emit, stop):
            # Any failure (decode error, native-warp error, ...) propagates
            # into _pump's forwarding and re-raises in the consumer.  The
            # sampler works on the SAME epoch decode_batch's RNG captured
            # above — _batches_indices must not re-read self.epoch on this
            # worker thread, where a set_epoch racing iterator creation
            # would desynchronize sampling order from augmentation draws.
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            completed = False
            try:
                futures = []
                for batch_number, batch_idx in self._batches_indices(epoch):
                    if stop.is_set():
                        return
                    futures.append(pool.submit(decode_batch, batch_number, batch_idx))
                    # Bound the number of in-flight decode jobs.
                    while len(futures) >= self.num_workers + self.prefetch:
                        emit(futures.pop(0).result())
                        if stop.is_set():
                            return
                for fut in futures:
                    if stop.is_set():
                        return
                    emit(fut.result())
                completed = True
            finally:
                # Abnormal exit (consumer abandoned the generator mid-epoch,
                # or a decode raised) must not block teardown on the queued
                # decode backlog — cancel what never started and let only
                # the already-running batches drain on their own threads.
                # Normal completion keeps the plain waiting shutdown.
                pool.shutdown(wait=completed, cancel_futures=not completed)

        return _pump(produce, maxsize=self.prefetch)
