"""Host input pipeline: COCO records -> augmented crop batches.

The reference uses torch DataLoader worker processes doing cv2 decode +
warp + numpy target generation per sample
(/root/reference/datasets/coco_dataset.py:121-183,253-306).  Here the host
does ONLY JPEG decode + one cv2.warpAffine per sample (in a thread pool —
cv2 releases the GIL) and ships uint8 crops; normalization and Gaussian
target generation are fused into the jit'd train step on device.
Per-sample determinism derives an RNG from (seed, epoch, index)
(SURVEY.md section 5.2).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..config import Config
from ..parallel import process_shard
from ..schemas import KeypointSchema
from . import transforms as T
from .coco import CocoIndex, build_records


class PoseDataset:
    """Record store + per-sample load/augment/warp.

    When the native C++ loader is available (``native/``), JPEG samples
    take a fused decode+warp path: the crop matrix is computed from the
    record's image dims, and one C call decodes only the needed source
    row band and warps it straight into the crop — no full-image
    materialization, no BGR->RGB pass.  ``native`` is "auto" (use when
    buildable), "on" (require), or "off".
    """

    def __init__(self, cfg: Config, records: List[Dict], image_root: str,
                 is_train: bool, image_cache: Optional[Dict] = None,
                 native: Optional[str] = None):
        self.cfg = cfg
        self.records = records
        self.image_root = image_root
        self.is_train = is_train
        self.schema: KeypointSchema = cfg.data.keypoint_schema
        self._cache = image_cache  # optional {file_name: ndarray} for tests
        if native is None:
            native = getattr(cfg.data, "native_loader", "auto")
        self._native = False
        self._fast = bool(is_train
                          and getattr(cfg.data, "native_fast", False))
        if native in ("auto", "on"):
            from .. import native as native_mod

            self._native = native_mod.available()
            if native == "on" and not self._native:
                raise RuntimeError(
                    "native_loader='on' but the native loader could not "
                    "be built (g++/libjpeg missing?)")

    def __len__(self) -> int:
        return len(self.records)

    def _load_image(self, rec: Dict) -> np.ndarray:
        import cv2

        if self._cache is not None and rec["image_file"] in self._cache:
            return self._cache[rec["image_file"]]
        path = os.path.join(self.image_root, rec["image_file"])
        img = cv2.imread(path)
        if img is None:
            raise ValueError(f"Failed to load image: {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def _native_eligible(self, rec: Dict) -> bool:
        if not (self._native and self._cache is None and "img_w" in rec):
            return False
        name = rec["image_file"].lower()
        if name.endswith((".jpg", ".jpeg")):
            return True
        if name.endswith(".png"):
            from .. import native as native_mod

            return native_mod.has_png()
        return False

    def _read_bytes(self, rec: Dict) -> bytes:
        path = os.path.join(self.image_root, rec["image_file"])
        try:
            with open(path, "rb") as f:
                return f.read()
        except OSError as e:  # same contract as _load_image
            raise ValueError(f"Failed to load image: {path}") from e

    def _transform(self, rec: Dict, idx: int, epoch: int, seed: int,
                   img_w: int, img_h: int) -> Dict:
        """Augmentation params + crop matrix (no pixels touched)."""
        sample = {
            "keypoints": rec["keypoints"].copy(),
            "visible": rec["visible"].copy(),
            "center": rec["center"].copy(),
            "scale": rec["scale"].copy(),
        }
        if self.is_train:
            rng = np.random.RandomState(
                (seed * 1_000_003 + epoch * 7919 + idx) % (2**31 - 1))
            return T.train_transform(rng, sample, img_w, self.schema,
                                     self.cfg.data, img_h=img_h)
        return T.val_transform(sample, img_w, self.cfg.data)

    def _finalize(self, rec: Dict, sample: Dict,
                  crop: np.ndarray) -> Dict:
        return {
            "image_u8": crop,
            "keypoints": sample["keypoints"].astype(np.float32),
            "visible": sample["visible"].astype(np.float32),
            "center": sample["center"].astype(np.float32),
            "scale": sample["scale"].astype(np.float32),
            "image_id": np.int64(rec["image_id"]),
            "ann_id": np.int64(rec["ann_id"]),
            "area": np.float32(rec["area"]),
            # cross-host equalization padding (parallel.process_shard)
            "pad": np.float32(bool(rec.get("_pad", False))),
        }

    def get(self, idx: int, epoch: int = 0, seed: int = 0) -> Dict:
        rec = self.records[idx]
        use_native = self._native_eligible(rec)
        if use_native:
            img = None
            img_w, img_h = rec["img_w"], rec["img_h"]
        else:
            img = self._load_image(rec)
            img_h, img_w = img.shape[:2]
        sample = self._transform(rec, idx, epoch, seed, img_w, img_h)

        W, H = self.cfg.data.input_size
        if use_native:
            from .. import native as native_mod

            data = self._read_bytes(rec)
            crop = native_mod.decode_warp(data, sample["matrix"], (W, H),
                                          fast=self._fast)
        else:
            import cv2

            crop = cv2.warpAffine(img, sample["matrix"].astype(np.float64),
                                  (int(W), int(H)), flags=cv2.INTER_LINEAR)
        return self._finalize(rec, sample, crop)

    def get_batch(self, idxs, epoch: int = 0, seed: int = 0,
                  nthreads: int = 0) -> List[Dict]:
        """Batch path: one native decode_warp_batch call (internal
        std::thread pool, fully GIL-free) for every native-eligible
        sample; the rest fall back to per-sample ``get``.  Identical
        output to ``[get(i) for i in idxs]`` — same per-index RNG.
        """
        idxs = [int(i) for i in idxs]
        nat = [i for i in idxs if self._native_eligible(self.records[i])]
        if len(nat) < 2:  # nothing to batch
            return [self.get(i, epoch, seed) for i in idxs]
        from .. import native as native_mod

        W, H = self.cfg.data.input_size
        metas, jpegs = {}, []
        for i in nat:
            rec = self.records[i]
            metas[i] = self._transform(rec, i, epoch, seed,
                                       rec["img_w"], rec["img_h"])
            jpegs.append(self._read_bytes(rec))
        mats = np.stack([metas[i]["matrix"] for i in nat])
        crops = native_mod.decode_warp_batch(jpegs, mats, (W, H),
                                             nthreads=nthreads,
                                             fast=self._fast)
        out = {i: self._finalize(self.records[i], metas[i], crops[j])
               for j, i in enumerate(nat)}
        return [out[i] if i in out else self.get(i, epoch, seed)
                for i in idxs]


def _collate(samples: List[Dict], pad_to: int) -> Dict[str, np.ndarray]:
    n = len(samples)
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    valid = 1.0 - batch.pop("pad", np.zeros(n, np.float32))
    if n < pad_to:
        reps = pad_to - n
        for k, v in batch.items():
            batch[k] = np.concatenate([v] + [v[-1:]] * reps, axis=0)
        valid = np.concatenate([valid, np.zeros(reps, np.float32)])
    batch["valid"] = valid.astype(np.float32)
    return batch


class DataLoader:
    """Threaded prefetching batch iterator over a PoseDataset."""

    def __init__(self, dataset: PoseDataset, batch_size: int,
                 shuffle: bool, seed: int = 0, num_threads: int = 8,
                 prefetch: int = 4, drop_last: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        if self.drop_last:
            order = order[: len(order) // self.batch_size * self.batch_size]

        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        use_batch = getattr(self.ds, "_native", False)

        def producer():
            try:
                with cf.ThreadPoolExecutor(self.num_threads) as pool:
                    if use_batch:
                        # One GIL-free C call per batch (its own
                        # std::thread pool); non-JPEG samples fall back
                        # to get() inside.  Two batches stay in flight
                        # so one batch's Python work (transforms, file
                        # reads — GIL-held) overlaps the other's C
                        # decode (GIL released by ctypes).
                        from collections import deque

                        def make(idxs):
                            return self.ds.get_batch(
                                idxs, epoch, self.seed,
                                nthreads=self.num_threads)

                        it = iter(batches)
                        futs = deque()
                        for idxs in (x for _, x in zip(range(2), it)):
                            futs.append(pool.submit(make, idxs))
                        while futs:
                            if stop.is_set():
                                return
                            samples = futs.popleft().result()
                            nxt = next(it, None)
                            if nxt is not None:
                                futs.append(pool.submit(make, nxt))
                            q.put(_collate(samples, self.batch_size))
                    else:
                        for idxs in batches:
                            if stop.is_set():
                                return
                            samples = list(pool.map(
                                lambda i: self.ds.get(int(i), epoch,
                                                      self.seed),
                                idxs))
                            q.put(_collate(samples, self.batch_size))
                q.put(None)
            except BaseException as e:  # propagate to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def build_dataloader(cfg: Config, is_train: bool,
                     image_cache: Optional[Dict] = None,
                     one_per_image: bool = False) -> DataLoader:
    """Build from config paths (ref datasets/coco_dataset.py:253-306)."""
    d = cfg.data
    ann = os.path.join(d.data_root, d.train_ann if is_train else d.val_ann)
    prefix = d.train_img_prefix if is_train else d.val_img_prefix
    index = CocoIndex(ann)
    records = build_records(index, img_prefix="",
                            bbox_padding=d.bbox_padding,
                            one_per_image=one_per_image)
    # Multi-host: each process loads only its shard of the records and
    # feeds 1/process_count of the global batch (parallel.shard_batch
    # assembles the global array).  Identity on a single host.
    import jax

    records = process_shard(records,
                            equalize="truncate" if is_train else "pad")
    ds = PoseDataset(cfg, records, os.path.join(d.data_root, prefix),
                     is_train, image_cache=image_cache)
    bs = cfg.train.global_batch_size if is_train else cfg.eval.batch_size
    bs = max(1, bs // jax.process_count())
    return DataLoader(ds, bs, shuffle=is_train, seed=cfg.train.seed,
                      drop_last=is_train)


def prefetch_to_device(batches, size: int = 2, keys=None, place=None):
    """Device-transfer prefetch stage: a thread that device_puts up to
    ``size`` upcoming batches ahead of the consumer.

    Completes the serving pipeline's 3 stages (host produce | H2D
    transfer | device compute): without it the H2D copy runs
    synchronously on the consumer thread and serializes with dispatch.
    The transfer thread spends its time in IO-wait, so it overlaps with
    the loader's CPU work even on a single-core host.

    ``keys`` optionally restricts which batch entries are transferred
    (the rest pass through untouched).  ``place`` overrides the transfer
    of each selected entry (default ``jnp.asarray``) — e.g. a mesh
    serving consumer passes a device_put with a batch NamedSharding.
    """
    import jax.numpy as jnp

    if place is None:
        place = jnp.asarray
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def _put(item) -> bool:
        # Bounded put that re-checks `stop`: a consumer that abandons the
        # stream mid-flight (break / downstream error) sets `stop` while
        # this thread may be parked in a blocking put on a full queue —
        # without the timeout loop the thread leaks forever, pinning up
        # to `size` device-committed batches in HBM.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def transfer():
        try:
            for batch in batches:
                if stop.is_set():
                    return
                out = dict(batch)
                for k, v in batch.items():
                    if keys is None or k in keys:
                        out[k] = place(v)
                if not _put(out):
                    return
            _put(None)
        except BaseException as e:  # propagate to the consumer
            _put(e)

    t = threading.Thread(target=transfer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def device_batch(batch: Dict[str, np.ndarray], mean, std):
    """Normalize a uint8 crop batch on device: (x/255 - mean)/std, plus
    passthrough of the label arrays. Returns jnp arrays dict."""
    import jax.numpy as jnp

    out = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_u8"}
    x = jnp.asarray(batch["image_u8"]).astype(jnp.float32) / 255.0
    out["image"] = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return out
