"""HTTP serving probe: concurrent clients against the micro-batching server.

The serving matrix (BENCH.md) measures the device pipeline; this probe
measures the full production surface the `ipe-serve` CLI exposes —
HTTP parse -> frame decode -> MicroBatcher -> device batch -> JSON —
under concurrent load on one chip, reporting sustained requests/s, the
latency distribution, and the device batch sizes the dispatcher formed
(the whole point of micro-batching: concurrent singles should ride
shared batches).

The reference serves one crop per process call with no batching
(/root/reference/inference.py:287-381); this probe quantifies what the
TPU-side dispatcher buys over that model.

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_serve_http
Env: PROBE_CLIENTS (default 32), PROBE_REQS (per client, default 40),
PROBE_QUANT (default 1), PROBE_WINDOW_MS (default 5),
PROBE_MAX_BATCH (default 64), PROBE_FRAME (default 256, square npy frame),
PROBE_QUEUE_DEPTH (default 0 = 4 x max-batch x depth),
PROBE_TIMEOUT_S (per-request deadline, default 60).

Overload/saturation row: run with clients >> capacity (e.g.
PROBE_CLIENTS=128) and a tight PROBE_QUEUE_DEPTH — 503-shed responses are
counted separately from transport errors, so the output shows goodput
(200s/s), shed rate, and whether p95 of the ACCEPTED requests stays
bounded while the server rejects the excess at admission.
"""

from __future__ import annotations

import io
import json
import os
import threading
import time

import numpy as np

import jax

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from ..config import Config
    from ..cli.serve import make_server
    from ..inference import PoseInference

    clients = int(os.environ.get("PROBE_CLIENTS", "32"))
    reqs = int(os.environ.get("PROBE_REQS", "40"))
    quant = os.environ.get("PROBE_QUANT", "1") == "1"
    window_ms = float(os.environ.get("PROBE_WINDOW_MS", "5"))
    max_batch = int(os.environ.get("PROBE_MAX_BATCH", "64"))
    side = int(os.environ.get("PROBE_FRAME", "256"))
    queue_depth = int(os.environ.get("PROBE_QUEUE_DEPTH", "0"))
    timeout_s = float(os.environ.get("PROBE_TIMEOUT_S", "60"))

    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "bfloat16"
    cfg.data.input_size = (192, 256)
    cfg.data.heatmap_size = (48, 64)
    cfg.eval.flip_test = False

    rng = np.random.RandomState(0)
    calib = None
    if quant:
        # Calibrate PTQ ranges up front so the first request batch
        # doesn't freeze scales on a single frame.
        calib = rng.randn(64, 256, 192, 3).astype(np.float32)
    infer = PoseInference(cfg, quantize=quant, calibration_crops=calib)

    # Record every device batch the dispatcher forms.
    batch_sizes = []
    real_predict = infer.predict_batch

    def tracked_predict(frames, bboxes):
        batch_sizes.append(len(frames))
        return real_predict(frames, bboxes)

    infer.predict_batch = tracked_predict

    # Pre-compile the serving jit for every power-of-two bucket at the
    # frame shape clients will send (predict_batch pads to these buckets,
    # so this is the complete program set the run can hit).
    b = 1
    while b <= max_batch:
        warm = np.zeros((b, side, side, 3), np.uint8)
        bbox = np.tile(np.asarray([[0, 0, side, side]], np.float32), (b, 1))
        real_predict(warm, bbox)
        b *= 2
    batch_sizes.clear()

    server, batcher = make_server(infer, host="127.0.0.1", port=0,
                                  max_batch=max_batch, window_ms=window_ms,
                                  queue_depth=queue_depth,
                                  request_timeout=timeout_s)
    port = server.server_address[1]
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()

    # One npy frame shared by all clients (server decodes per request).
    frame = rng.randint(0, 255, (side, side, 3), np.uint8)
    buf = io.BytesIO()
    np.save(buf, frame)
    body = buf.getvalue()

    lat_lock = threading.Lock()
    latencies = []
    shed = []       # 503 admission rejections (expected under overload)
    timeouts = []   # 504 deadline expiries
    errors = []     # transport failures / unexpected statuses

    def client(n_requests: int):
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        for _ in range(n_requests):
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/predict", body=body,
                             headers={"Content-Type": "application/x-npy"})
                resp = conn.getresponse()
                payload = resp.read()
                if resp.status == 503:
                    with lat_lock:
                        shed.append(resp.headers.get("Retry-After"))
                    continue
                if resp.status == 504:
                    with lat_lock:
                        timeouts.append(time.perf_counter() - t0)
                    continue
                if resp.status != 200:
                    raise RuntimeError(payload[:200])
            except Exception as e:
                with lat_lock:
                    errors.append(repr(e))
                conn.close()
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=120)
                continue
            with lat_lock:
                latencies.append(time.perf_counter() - t0)
        conn.close()

    # Warmup burst (not timed): exercise the dispatcher + JSON path.
    warm_threads = [threading.Thread(target=client, args=(4,))
                    for _ in range(min(4, clients))]
    for t in warm_threads:
        t.start()
    for t in warm_threads:
        t.join()
    latencies.clear()
    shed.clear()
    timeouts.clear()
    errors.clear()
    batch_sizes.clear()

    threads = [threading.Thread(target=client, args=(reqs,))
               for _ in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    server.shutdown()
    batcher.stop()
    server.server_close()

    n_ok = len(latencies)
    lat = np.sort(np.asarray(latencies)) * 1e3
    if lat.size == 0:
        lat = np.asarray([0.0])
    sizes = np.asarray(batch_sizes) if batch_sizes else np.asarray([0])
    out = {
        "requests_per_sec": round(n_ok / wall, 1),
        "clients": clients,
        "requests_ok": n_ok,
        "shed_503": len(shed),
        "timeout_504": len(timeouts),
        "errors": len(errors),
        "queue_depth": batcher.queue_depth,
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 1),
        "latency_ms_p95": round(float(np.percentile(lat, 95)), 1),
        "latency_ms_p99": round(float(np.percentile(lat, 99)), 1),
        "mean_device_batch": round(float(sizes.mean()), 1),
        "max_device_batch": int(sizes.max()),
        "num_device_batches": int(len(batch_sizes)),
        "window_ms": window_ms,
        "precision": "int8-ptq" if quant else "bf16-fold",
        "frame": f"{side}x{side} npy",
    }
    if errors:
        out["first_error"] = errors[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
