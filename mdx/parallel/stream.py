"""Host→device streaming: decode-ahead pipeline for batch QA.

SURVEY.md §2.9 row 3: the reference decodes and computes serially in one
thread (ref pipeline/runner.py:79-153).  Here host-side DICOM decode +
normalisation (NumPy / native C++ kernels) runs in a thread pool that
stays ≥``prefetch`` batches ahead of the device, and each ready batch is
``jax.device_put`` onto the mesh while the previous one computes — the
classic double-buffered input pipeline, with the host threads doing real
work (pydicom-free decode, mdx/io/dicom.py) while XLA owns the chips.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class DecodeStream:
    """Iterator of device-resident [B,H,W] batches, decoded ahead of use.

    ``items`` are opaque work units; ``decode_fn(item) -> np.ndarray [H,W]``
    runs on host threads.  Batches are formed in submission order so
    results remain aligned with ``items``.
    """

    def __init__(
        self,
        items: Sequence,
        decode_fn: Callable[[object], np.ndarray],
        batch_size: int,
        *,
        prefetch: int = 2,
        workers: int = 4,
        device_put: Callable[[np.ndarray], object] | None = None,
    ):
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        self._items = list(items)
        self._decode = decode_fn
        self._bs = batch_size
        self._prefetch = max(prefetch, 1)
        self._workers = max(workers, 1)
        self._device_put = device_put
        self._out: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    # -- producer side ----------------------------------------------------

    def _producer(self) -> None:
        try:
            slots: dict[int, np.ndarray | Exception] = {}
            lock = threading.Lock()
            ready = self._ready = threading.Condition(lock)
            next_idx = 0
            # decode-ahead window: frames beyond `watermark` wait, so host
            # memory is bounded by (prefetch+1) batches of decoded frames —
            # not the whole input list
            window = (self._prefetch + 1) * self._bs
            state = {"watermark": window}
            work = queue.Queue()
            for i, item in enumerate(self._items):
                work.put((i, item))

            def worker():
                while not self._stop.is_set():
                    try:
                        i, item = work.get_nowait()
                    except queue.Empty:
                        return
                    with ready:
                        ready.wait_for(
                            lambda: i < state["watermark"]
                            or self._stop.is_set())
                    if self._stop.is_set():
                        return
                    try:
                        arr = np.asarray(self._decode(item), np.float32)
                    except Exception as exc:  # surfaced at batch boundary
                        arr = exc
                    with ready:
                        slots[i] = arr
                        ready.notify_all()

            threads = [threading.Thread(target=worker, daemon=True)
                       for _ in range(self._workers)]
            for t in threads:
                t.start()

            def _emit(obj) -> bool:
                """Bounded put that aborts instead of blocking forever when
                the consumer closed the stream."""
                while not self._stop.is_set():
                    try:
                        self._out.put(obj, timeout=0.2)
                        return True
                    except queue.Full:
                        continue
                return False

            n = len(self._items)
            while next_idx < n and not self._stop.is_set():
                hi = min(next_idx + self._bs, n)
                with ready:
                    ready.wait_for(lambda: all(
                        i in slots for i in range(next_idx, hi))
                        or self._stop.is_set())
                    if self._stop.is_set():
                        return
                    chunk = [slots.pop(i) for i in range(next_idx, hi)]
                    state["watermark"] = hi + window
                    ready.notify_all()
                errs = [c for c in chunk if isinstance(c, Exception)]
                if errs:
                    _emit(errs[0])
                    return
                batch = np.stack(chunk)
                if self._device_put is not None:
                    batch = self._device_put(batch)
                if not _emit((next_idx, batch)):
                    return
                next_idx = hi
            _emit(None)
        except Exception as exc:  # pragma: no cover — defensive
            try:
                self._out.put_nowait(exc)
            except queue.Full:
                pass
        finally:
            # unblock and retire the worker pool whatever happened (decode
            # error, consumer close, normal completion)
            self._stop.set()
            with ready:
                ready.notify_all()

    # -- consumer side ----------------------------------------------------

    def __iter__(self) -> Iterator:
        while True:
            got = self._out.get()
            if got is None:
                return
            if isinstance(got, Exception):
                raise got
            yield got

    def join(self, timeout: float = 5.0) -> None:
        """Wait for the producer thread to retire (mainly for tests)."""
        self._thread.join(timeout)

    def close(self) -> None:
        self._stop.set()
        ready = getattr(self, "_ready", None)
        if ready is not None:
            with ready:
                ready.notify_all()


def stream_batches(
    paths: Iterable[str],
    batch_size: int = 8,
    *,
    mesh=None,
    prefetch: int = 2,
    workers: int = 4,
):
    """Decode DICOM files ahead of the device: yields (start_index,
    sharded [B,H,W] device array).  Shapes must be homogeneous — bucket
    first (mdx/pipeline/batch_runner.py)."""
    import jax

    from mdx.io import load_dicom, normalize_image
    from mdx.parallel.mesh import data_sharding

    def _decode(path: str) -> np.ndarray:
        img, _meta = load_dicom(path)
        return normalize_image(img)

    put = None
    if mesh is not None:
        sharding = data_sharding(mesh)
        d = mesh.shape["data"]

        def put(batch):  # noqa: F811
            # a ragged final batch (or batch_size not a multiple of the
            # data-axis size) must be padded before sharding — NamedSharding
            # requires dim 0 divisible by the axis size.  Padding replicates
            # the last frame; consumers recover the valid count as
            # min(batch_size, len(paths) - start).
            n = batch.shape[0]
            target = -(-n // d) * d
            if target != n:
                batch = np.concatenate(
                    [batch, np.broadcast_to(batch[-1:],
                                            (target - n,) + batch.shape[1:])])
            return jax.device_put(batch, sharding)

    return DecodeStream(list(paths), _decode, batch_size,
                        prefetch=prefetch, workers=workers, device_put=put)
