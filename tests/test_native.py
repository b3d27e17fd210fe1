"""Native C++ IO + ring buffer tests (with fallback parity)."""
import threading

import numpy as np

from open3d_slam_advanced_rss_2024_public_tpu import native


def test_native_lib_builds():
    # The image has g++; the library must build and load.
    assert native.get_lib() is not None


def test_decode_f32_file(tmp_path):
    data = np.random.RandomState(0).randn(1000, 4).astype(np.float32)
    path = str(tmp_path / "scan.bin")
    data.tofile(path)
    out = native.decode_f32_file(path)
    np.testing.assert_array_equal(out, data.reshape(-1))


def test_decode_with_cap(tmp_path):
    data = np.arange(100, dtype=np.float32)
    path = str(tmp_path / "x.bin")
    data.tofile(path)
    out = native.decode_f32_file(path, max_floats=40)
    np.testing.assert_array_equal(out, data[:40])


def test_ring_buffer_fifo():
    rb = native.NativeRingBuffer(n_slots=3, slot_floats=16)
    assert rb.pop() is None
    assert rb.push(np.arange(8, dtype=np.float32), 1.5)
    assert rb.push(np.arange(4, dtype=np.float32) + 100, 2.5)
    assert len(rb) == 2
    payload, stamp = rb.pop()
    np.testing.assert_array_equal(payload, np.arange(8, dtype=np.float32))
    assert stamp == 1.5
    payload, stamp = rb.pop()
    assert stamp == 2.5 and payload.size == 4


def test_ring_buffer_bounded_drop():
    rb = native.NativeRingBuffer(n_slots=2, slot_floats=8)
    assert rb.push(np.zeros(4, np.float32), 0.0)
    assert rb.push(np.zeros(4, np.float32), 1.0)
    assert not rb.push(np.zeros(4, np.float32), 2.0)  # full -> drop


def test_ring_buffer_threaded():
    rb = native.NativeRingBuffer(n_slots=8, slot_floats=64)
    received = []

    def consumer():
        while len(received) < 100:
            item = rb.pop()
            if item is not None:
                received.append(item[1])

    t = threading.Thread(target=consumer)
    t.start()
    i = 0
    while i < 100:
        if rb.push(np.full(32, i, np.float32), float(i)):
            i += 1
    t.join(timeout=10)
    assert received == [float(i) for i in range(100)]
