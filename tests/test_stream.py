"""Host→device streaming prefetcher tests (mdx/parallel/stream.py)."""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from mdx.parallel.stream import DecodeStream, stream_batches


class TestDecodeStream:
    def test_order_and_content(self):
        items = list(range(10))
        stream = DecodeStream(
            items, lambda i: np.full((4, 4), float(i)), batch_size=3)
        got = list(stream)
        assert [s for s, _ in got] == [0, 3, 6, 9]
        assert got[0][1].shape == (3, 4, 4)
        assert got[-1][1].shape == (1, 4, 4)
        np.testing.assert_array_equal(got[1][1][0],
                                      np.full((4, 4), 3.0))

    def test_decode_error_surfaces(self):
        def bad(i):
            if i == 2:
                raise ValueError("corrupt file")
            return np.zeros((2, 2))

        stream = DecodeStream(list(range(4)), bad, batch_size=2)
        with pytest.raises(ValueError, match="corrupt file"):
            list(stream)

    def test_decode_overlaps_consumption(self):
        """Producer threads must keep decoding while the consumer is busy."""
        decoded = []
        lock = threading.Lock()

        def slow_decode(i):
            with lock:
                decoded.append(i)
            return np.zeros((2, 2))

        stream = DecodeStream(list(range(8)), slow_decode, batch_size=2,
                              prefetch=2, workers=4)
        it = iter(stream)
        next(it)
        time.sleep(0.3)  # consumer stalls; prefetch should run ahead
        assert len(decoded) >= 6
        rest = list(it)
        assert len(rest) == 3

    def test_device_put_hook(self):
        tagged = []

        def put(batch):
            tagged.append(batch.shape)
            return batch * 2

        stream = DecodeStream([1, 2], lambda i: np.ones((2, 2)),
                              batch_size=2, device_put=put)
        (_, batch), = list(stream)
        assert tagged == [(2, 2, 2)]
        np.testing.assert_array_equal(batch, np.full((2, 2, 2), 2.0))


class TestStreamBatches:
    def test_dicom_stream(self, tmp_path):
        from mdx.io.dicom_write import write_synthetic_dicom

        paths = []
        for i in range(3):
            p = str(tmp_path / f"{i}.dcm")
            write_synthetic_dicom(p, kind="noisy", size=32, seed=i)
            paths.append(p)
        batches = list(stream_batches(paths, batch_size=2))
        assert [s for s, _ in batches] == [0, 2]
        assert np.asarray(batches[0][1]).shape == (2, 32, 32)
        arr = np.asarray(batches[0][1])
        assert arr.min() >= 0.0 and arr.max() <= 1.0


class TestStreamLifecycle:
    def test_error_retires_workers(self):
        def bad(i):
            if i == 2:
                raise ValueError("corrupt")
            return np.zeros((2, 2))

        stream = DecodeStream(list(range(50)), bad, batch_size=2, workers=4)
        with pytest.raises(ValueError):
            list(stream)
        stream.join()
        assert not stream._thread.is_alive()

    def test_close_retires_producer(self):
        stream = DecodeStream(list(range(50)),
                              lambda i: np.zeros((2, 2)), batch_size=2,
                              prefetch=1)
        it = iter(stream)
        next(it)
        stream.close()
        stream.join()
        assert not stream._thread.is_alive()

    def test_mesh_pads_ragged_final_batch(self, tmp_path):
        from mdx.io.dicom_write import write_synthetic_dicom
        from mdx.parallel import make_mesh

        mesh = make_mesh(n_data=4, n_space=1)
        paths = []
        for i in range(5):  # final batch of 1 on a 4-device axis
            p = str(tmp_path / f"{i}.dcm")
            write_synthetic_dicom(p, kind="noisy", size=32, seed=i)
            paths.append(p)
        batches = list(stream_batches(paths, batch_size=4, mesh=mesh))
        assert [s for s, _ in batches] == [0, 4]
        assert np.asarray(batches[1][1]).shape[0] == 4  # padded 1 → 4
