"""Batching + background-prefetch data loader.

Replaces torch DataLoader (reference partnet_data.py:254-262): a thread
pool collates fixed-shape numpy batches while the device computes (the
native mesh sampler releases the GIL, so threads scale).  For multi-host
training, the index space is sharded by process (per-host input pipelines,
the jax.distributed equivalent of DistributedSampler).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

__all__ = ['DataLoader']


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False,
                 num_workers=4, seed=0, prefetch=3, shard_by_process=True,
                 batch_collate=False, transform=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        # transform: applied to each collated batch IN the producer thread
        # before enqueueing.  The Trainer/bench install a device-placement
        # transform here so the host->device transfer (and the packed
        # expand dispatch) overlaps device compute of in-flight steps; the
        # consumer's data wait then collapses to a queue get.
        self.transform = transform
        # group mode: stage B collects `group_size` collated batches and
        # hands the LIST to `group_transform` (one device_put RPC + one
        # expand per group instead of per batch -- each RPC costs ~2-6ms
        # of host CPU through the remote tunnel).  Epoch-tail remainders
        # (< group_size) fall back to the per-batch `transform`.
        self.group_size = 1
        self.group_transform = None
        # group_key: item -> hashable; only same-key batches group (the
        # epoch-tail remainder batch has a smaller batch axis and must not
        # be stacked with full ones).  None = group everything.
        self.group_key = None
        # batch_collate: hand whole index batches to dataset.collate_batch
        # (one GIL-released native call, packed output) instead of per-item
        # __getitem__ + stack.  Callers enable it only when a single local
        # device consumes the whole batch (packed arrays have no batch axis
        # to shard across devices).
        self.batch_collate = bool(batch_collate) and \
            hasattr(dataset, 'collate_batch')
        if shard_by_process and jax.process_count() > 1:
            self._shard_id = jax.process_index()
            self._num_shards = jax.process_count()
        else:
            self._shard_id, self._num_shards = 0, 1

    def __len__(self):
        n = len(self.dataset) // self._num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch):
        self.epoch = epoch
        if hasattr(self.dataset, 'set_epoch'):
            self.dataset.set_epoch(epoch)

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard, truncated to the same count on every host: a
        # count mismatch would have hosts dispatch different numbers of
        # collective-bearing steps and deadlock the mesh (the reference's
        # DistributedSampler pads with duplicates instead; truncation
        # drops <num_shards samples per epoch)
        idx = idx[self._shard_id::self._num_shards]
        return idx[:n // self._num_shards]

    @staticmethod
    def _collate(items):
        out = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            if np.isscalar(vals[0]) or np.asarray(vals[0]).ndim == 0:
                out[k] = np.asarray(vals)
            else:
                out[k] = np.stack(vals, axis=0)
        return out

    def __iter__(self):
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else \
            (len(idx) + self.batch_size - 1) // self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(out_q, item):
            """Stop-aware enqueue: a plain blocking put on a full queue
            parks the producer FOREVER once the consumer abandons the
            iterator (generator close sets `stop` but nothing drains), so
            every finished epoch/row would leak a thread pinning its
            prefetched batches.  Returns False when stopped."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce(out_q):
            # items fetch in a worker pool (the native mesh sampler and
            # numpy both release the GIL, so threads scale ~linearly)
            pool = ThreadPoolExecutor(self.num_workers) \
                if self.num_workers > 1 else None
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    try:
                        if self.batch_collate:
                            batch = self.dataset.collate_batch(
                                [int(i) for i in b])
                        else:
                            fetch = pool.map if pool else map
                            items = list(fetch(
                                lambda i: self.dataset[int(i)], b))
                            batch = self._collate(items)
                        if not put_or_stop(out_q, batch):
                            return
                    except Exception as e:  # surface errors to the consumer
                        put_or_stop(out_q, e)
                        return
                put_or_stop(out_q, None)
            finally:
                if pool:
                    pool.shutdown(wait=False)

        use_groups = self.group_size > 1 and self.group_transform is not None
        if self.transform is not None or use_groups:
            # two-stage pipeline: stage A (collate; GIL-released native
            # sampling) and stage B (transform: device_put + packed
            # expand, mostly wire-wait) run in SEPARATE threads so they
            # overlap -- in one thread their costs add (~4ms + ~2.4ms
            # per batch, measured), which was slower than no transform
            q1 = queue.Queue(maxsize=max(self.prefetch, self.group_size))

            def stage_b():
                pend = []

                def flush_tail():
                    # epoch-tail remainder: per-batch path
                    for it in pend:
                        put_or_stop(
                            q, self.transform(it) if self.transform else it)
                    pend.clear()

                while True:
                    try:  # stop-aware: produce() may stop sentinel-less
                        item = q1.get(timeout=0.2)
                    except queue.Empty:
                        if stop.is_set():
                            return
                        continue
                    if item is None or isinstance(item, Exception):
                        try:
                            flush_tail()
                        except Exception as e:
                            put_or_stop(q, e)
                            return
                        put_or_stop(q, item)
                        return
                    if stop.is_set():
                        return
                    try:
                        if use_groups:
                            if (pend and self.group_key is not None
                                    and self.group_key(item)
                                    != self.group_key(pend[0])):
                                flush_tail()  # incompatible (tail) batch
                            pend.append(item)
                            if len(pend) == self.group_size:
                                group = self.group_transform(list(pend))
                                pend.clear()
                                if not put_or_stop(q, group):
                                    return
                        else:
                            if not put_or_stop(q, self.transform(item)):
                                return
                    except Exception as e:
                        put_or_stop(q, e)
                        return

            ta = threading.Thread(target=produce, args=(q1, ), daemon=True)
            tb = threading.Thread(target=stage_b, daemon=True)
            ta.start()
            tb.start()
        else:
            threading.Thread(target=produce, args=(q, ), daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
