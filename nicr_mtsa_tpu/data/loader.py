"""Threaded prefetching data loader.

The reference relies on torch.utils.data.DataLoader with worker
processes (testing/dataset.py:51-58). This loader covers that role
standalone: map-style dataset + sampler -> preprocessing in a thread
pool (numpy preprocessing releases the GIL in its hot loops) ->
collate -> optional device transfer, with a bounded prefetch queue so
host preprocessing overlaps device compute."""
import queue
import threading
from typing import Any, Callable, Iterable, Optional, Sequence

from ._collate import mt_collate
from ._utils import move_batch_to_device


class DataLoader:
    def __init__(
        self,
        dataset: Sequence,
        batch_size: int = 1,
        sampler: Optional[Iterable[int]] = None,
        shuffle: bool = False,
        num_workers: int = 2,
        collate_fn: Callable = mt_collate,
        drop_last: bool = False,
        prefetch_batches: int = 2,
        to_device: bool = False,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self.to_device = to_device

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        import numpy as np
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.shuffle(idx)
        return idx.tolist()

    def _batches(self):
        indices = self._indices()
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __len__(self):
        n = (len(self.sampler) if self.sampler is not None
             else len(self.dataset))
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _load_batch(self, chunk):
        samples = [self.dataset[i] for i in chunk]
        batch = self.collate_fn(samples)
        if self.to_device:
            batch = move_batch_to_device(batch)
        return batch

    def __iter__(self):
        if self.num_workers == 0:
            for chunk in self._batches():
                yield self._load_batch(chunk)
            return

        out_q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch_batches)
        chunks = list(self._batches())
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(self.num_workers) as pool:
                    # keep ordering: map preserves chunk order
                    for batch in pool.map(self._load_batch, chunks):
                        if stop.is_set():
                            return
                        out_q.put(batch)
            except Exception as e:  # surface worker errors to consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
