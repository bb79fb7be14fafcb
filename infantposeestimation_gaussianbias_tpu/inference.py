"""High-level inference API: single image, batch, directory, video.

Rebuild of /root/reference/inference.py:24-284 (PoseInference) with the
TPU-native difference that preprocess -> forward -> decode -> back-project
is ONE fused jit over a whole batch of crops — the reference loops
`predict` per image (inference.py:217-236).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import Config
from .models import (build_model, flip_inference, serving_mode_supported,
                     validate_serving_mode)
from .ops import decode as decode_ops
from .ops.jitopt import serving_jit
from .train.checkpoint import CheckpointManager
from .train.step import create_train_state


def detect_persons(image: np.ndarray) -> List[np.ndarray]:
    """Full-image bbox placeholder detector
    (ref inference.py:270-284 does the same)."""
    h, w = image.shape[:2]
    return [np.array([0, 0, w, h], np.float32)]


class PoseInference:
    """Checkpoint-backed pose predictor.

    ``quantize=True`` serves in int8 (ops/quant.py): the model is
    PTQ-calibrated on the first predicted batch's crops (or pass
    ``calibration_crops`` — normalized (N, H, W, 3) arrays — to calibrate
    at construction), then every forward runs the int8 MXU path.

    Float serving uses BN-fold by default when the architecture supports
    it (models/fold.py — exact transform, removes the stand-alone BN ops
    whose layout overhead dominates the stem); ``fold=False`` disables.

    ``mesh`` (a ('data','model') jax.sharding.Mesh from
    parallel.create_mesh) serves across chips: batches are sharded over
    the 'data' axis (padded to a multiple of it and trimmed on the way
    out, so ragged final batches work), parameters are replicated — or
    sharded over 'model' with ``tensor_parallel=True`` — and XLA inserts
    the collectives.  The reference has no multi-device serving at all
    (/root/reference/inference.py:24-284 is strictly single-GPU);
    single-controller scope (one host driving all chips).
    """

    def __init__(self, cfg: Config, checkpoint: Optional[str] = None,
                 state=None, quantize: bool = False,
                 calibration_crops: Optional[np.ndarray] = None,
                 fold: Optional[bool] = None, mesh=None,
                 tensor_parallel: bool = False):
        self.cfg = cfg
        self.schema = cfg.data.keypoint_schema
        self.mesh = mesh
        self.tensor_parallel = tensor_parallel
        model = build_model(cfg)
        if state is None:
            state = create_train_state(cfg, model,
                                       jax.random.PRNGKey(cfg.train.seed))
            if checkpoint:
                mgr = CheckpointManager(os.path.dirname(checkpoint) or ".")
                state, _ = mgr.restore(state,
                                       os.path.basename(checkpoint))
        self.state = state
        self._apply_fn = state.apply_fn
        self._variables = state.variables
        self.quantize = quantize
        if quantize:
            # fail fast on unsupported architectures: flax setup() is lazy,
            # so this must run eagerly (same check PoseEstimator.setup uses)
            validate_serving_mode(cfg.model.backbone, cfg.model.head_type,
                                  cfg.model.norm, quant=True)
            if calibration_crops is not None:
                self._install_quant([jnp.asarray(calibration_crops)])
        else:
            if fold is None:
                fold = serving_mode_supported(
                    cfg.model.backbone, cfg.model.head_type,
                    cfg.model.norm, fold=True)
            if fold:
                from .models import fold_variables

                self._variables = fold_variables(state.variables)
                self._apply_fn = build_model(cfg, fold=True,
                                             mesh=mesh).apply
            elif mesh is not None:
                # thread the mesh into the unfolded float forward too
                # (shard_map'd Pallas W-MSA on hrformer backbones)
                self._apply_fn = build_model(cfg, mesh=mesh).apply
        self._shard_variables()
        self._jit_pipeline = serving_jit(self._pipeline)

    # -- mesh serving -------------------------------------------------------

    def _shard_variables(self) -> None:
        """Place serving variables onto the mesh (replicated, or 'model'-
        sharded kernels under tensor_parallel); no-op without a mesh."""
        if self.mesh is not None:
            from .parallel import shard_params

            self._variables = shard_params(self._variables, self.mesh,
                                           self.tensor_parallel)

    def _data_multiple(self) -> int:
        return int(self.mesh.shape["data"]) if self.mesh is not None else 1

    def _place_rows(self, x):
        """Pad a batch-leading array to a multiple of the 'data' axis and
        commit it with batch sharding (plain jnp.asarray without a mesh).
        Pad rows repeat the last row; callers trim outputs to the
        original count."""
        if self.mesh is None:
            return jnp.asarray(x)
        from .parallel import batch_sharding

        x = np.asarray(x)
        r = (-x.shape[0]) % self._data_multiple()
        if r:
            x = np.concatenate([x, np.repeat(x[-1:], r, axis=0)], axis=0)
        return jax.device_put(x, batch_sharding(self.mesh))

    # -- int8 serving -------------------------------------------------------

    def _install_quant(self, calib_crops) -> None:
        from .models import quantize_model

        self._variables = quantize_model(self.cfg, self.state.variables,
                                         calib_crops)
        self._apply_fn = build_model(self.cfg, quant=True,
                                     mesh=self.mesh).apply
        self._shard_variables()
        self._jit_pipeline = serving_jit(self._pipeline)
        # the quantized apply_fn replaces the float one; drop any jit
        # built against the old closure (invalidate at the mutation
        # site so every install path is covered)
        if hasattr(self, "_jit_crops_pipeline"):
            del self._jit_crops_pipeline
        self._quant_installed = True

    def _warn_small_calibration(self, n_crops: int) -> None:
        if n_crops >= self.MIN_SELF_CALIB_CROPS:
            return
        import warnings

        warnings.warn(
            f"int8 PTQ self-calibrating on the first predicted batch of "
            f"only {n_crops} crop(s); activation ranges freeze "
            f"here permanently. Pass calibration_crops (>= "
            f"{self.MIN_SELF_CALIB_CROPS} representative crops) to "
            f"PoseInference for stable quantization.",
            stacklevel=4)

    # PTQ abs-max ranges freeze after the first calibration; below this
    # many crops a single unrepresentative batch (e.g. one dark frame)
    # would silently degrade every later prediction.
    MIN_SELF_CALIB_CROPS = 32

    def _maybe_calibrate(self, frames, centers, scales) -> None:
        if not self.quantize or getattr(self, "_quant_installed", False):
            return
        self._warn_small_calibration(frames.shape[0])
        from .ops import affine

        W, H = self.cfg.data.input_size
        crops = jax.jit(lambda f, c, s: affine.crop_and_normalize(
            f, c, s, (W, H), mean=self.cfg.data.pixel_mean,
            std=self.cfg.data.pixel_std))(frames, centers, scales)
        self._install_quant([crops])

    # -- fused device pipeline -------------------------------------------

    def _pipeline(self, frames, centers, scales):
        from .ops import affine

        cfg = self.cfg
        W, H = cfg.data.input_size
        hm_w, hm_h = cfg.data.heatmap_size
        crops = affine.crop_and_normalize(
            frames, centers, scales, (W, H),
            mean=cfg.data.pixel_mean, std=cfg.data.pixel_std)
        flip_idx = jnp.asarray(self.schema.flip_index())
        coords, scores = flip_inference(
            self._apply_fn, self._variables, crops, flip_idx,
            cfg.model.head_type, cfg.eval.decode,
            shift_heatmap=cfg.eval.shift_heatmap, flip=cfg.eval.flip_test)
        coords = coords * jnp.asarray([W / hm_w, H / hm_h], jnp.float32)
        coords = decode_ops.transform_preds(coords, centers, scales, (W, H))
        return coords, scores

    # -- public API --------------------------------------------------------

    @staticmethod
    def _bucket_rows(n: int) -> int:
        """Next power-of-two batch bucket.

        ``predict_batch`` callers form arbitrary batch sizes (the serve
        CLI's micro-batcher drains whatever burst arrived; directory
        inference chunks ragged groups) and jax.jit retraces per distinct
        leading dimension — under concurrent load that is a compile storm
        (tens of multi-second compiles). Padding every batch up to a
        power-of-two bucket caps the program count at log2(max_batch)+1
        for ≤2x padding compute on the worst-case row.
        """
        return 1 << max(0, int(n - 1).bit_length())

    def predict_batch(self, frames: np.ndarray, bboxes: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """frames (B, H, W, 3) RGB uint8 (equal size); bboxes (B, 4) xyxy.

        Returns keypoints (B, K, 2) in frame coordinates and scores (B, K).

        Frames cross host->device in their native dtype (uint8 for the
        documented contract — 4x fewer H2D bytes than a host-side float
        cast; the fused pipeline casts on device) and the batch is padded
        to a power-of-two bucket (see ``_bucket_rows``), with outputs
        trimmed back to the caller's count.
        """
        bboxes = np.asarray(bboxes, np.float32)
        n = bboxes.shape[0]
        centers = (bboxes[:, :2] + bboxes[:, 2:]) / 2.0
        scales = (bboxes[:, 2:] - bboxes[:, :2]) * self.cfg.data.bbox_padding
        frames = np.asarray(frames)
        pad = self._bucket_rows(n) - n
        if pad:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, axis=0)])
            centers = np.concatenate(
                [centers, np.repeat(centers[-1:], pad, axis=0)])
            scales = np.concatenate(
                [scales, np.repeat(scales[-1:], pad, axis=0)])
        frames_j = self._place_rows(frames)
        centers_j = self._place_rows(centers)
        scales_j = self._place_rows(scales)
        self._maybe_calibrate(frames_j, centers_j, scales_j)
        coords, scores = self._jit_pipeline(frames_j, centers_j, scales_j)
        return np.asarray(coords)[:n], np.asarray(scores)[:n]

    def predict_stream(self, batches, max_in_flight: int = 2):
        """Overlapped host/device serving: consume loader batches while
        the device computes (round-2 verdict item 6).

        ``batches`` is an iterator of dicts with ``image_u8`` (B, H, W, 3)
        uint8 crops plus ``center``/``scale`` (the DataLoader eval
        contract).  Three overlapped stages: the loader's producer
        thread decodes and augments ahead (data/pipeline.py DataLoader);
        a transfer thread device_puts up to ``max_in_flight`` batches
        ahead (prefetch_to_device — the H2D copy waits on IO off the
        consumer thread); and each compute step dispatches
        asynchronously with results materialized ``max_in_flight``
        batches behind the front.

        Yields (coords (B, K, 2) source-space, scores (B, K)) numpy
        arrays per batch, in order.
        """
        import collections

        from .data.pipeline import prefetch_to_device

        def annotate(it):
            for b in it:
                b = dict(b)
                b["_orig_n"] = int(np.asarray(b["image_u8"]).shape[0])
                yield b

        pending: "collections.deque" = collections.deque()
        place = self._place_rows if self.mesh is not None else None
        staged = prefetch_to_device(annotate(batches), size=max_in_flight,
                                    keys=("image_u8", "center", "scale"),
                                    place=place)
        for batch in staged:
            self._maybe_calibrate_crops(batch)
            out = self._crops_pipeline_jit()(
                self._variables,
                batch["image_u8"],
                batch["center"],
                batch["scale"])
            pending.append((out, batch["_orig_n"]))
            if len(pending) > max_in_flight:
                (c, s), n = pending.popleft()
                yield np.asarray(c)[:n], np.asarray(s)[:n]
        while pending:
            (c, s), n = pending.popleft()
            yield np.asarray(c)[:n], np.asarray(s)[:n]

    def _crops_pipeline_jit(self):
        """(Re)build the jitted u8-crops serving fn against the CURRENT
        apply_fn (calibration swaps it mid-stream on the first batch)."""
        if hasattr(self, "_jit_crops_pipeline"):
            return self._jit_crops_pipeline

        cfg = self.cfg
        W, H = cfg.data.input_size
        hm_w, hm_h = cfg.data.heatmap_size
        mean = jnp.asarray(cfg.data.pixel_mean, jnp.float32) * 255.0
        std = jnp.asarray(cfg.data.pixel_std, jnp.float32) * 255.0
        flip_idx = jnp.asarray(self.schema.flip_index())
        apply_fn = self._apply_fn

        def crops_pipeline(variables, crops_u8, centers, scales):
            crops = (crops_u8.astype(jnp.float32) - mean) / std
            coords, scores = flip_inference(
                apply_fn, variables, crops, flip_idx,
                cfg.model.head_type, cfg.eval.decode,
                shift_heatmap=cfg.eval.shift_heatmap,
                flip=cfg.eval.flip_test)
            coords = coords * jnp.asarray([W / hm_w, H / hm_h],
                                          jnp.float32)
            coords = decode_ops.transform_preds(coords, centers,
                                                scales, (W, H))
            return coords, scores

        # IPE_DONATE_SERVING=1: donate the u8 crop buffer (arg 1) — each
        # streamed batch array is consumed exactly once, so XLA may reuse
        # its HBM for activations.  Off by default: predict_batch callers
        # may legitimately reuse a device-resident input across calls.
        donate = (os.environ.get("IPE_DONATE_SERVING", "0") == "1"
                  and self.mesh is None)
        self._jit_crops_pipeline = serving_jit(
            crops_pipeline, donate_argnums=(1,) if donate else ())
        return self._jit_crops_pipeline

    def _maybe_calibrate_crops(self, batch) -> None:
        if not self.quantize or getattr(self, "_quant_installed", False):
            return
        cfg = self.cfg
        self._warn_small_calibration(int(batch["image_u8"].shape[0]))
        mean = jnp.asarray(cfg.data.pixel_mean, jnp.float32) * 255.0
        std = jnp.asarray(cfg.data.pixel_std, jnp.float32) * 255.0
        crops = (jnp.asarray(batch["image_u8"]).astype(jnp.float32)
                 - mean) / std
        self._install_quant([crops])

    def predict(self, image: np.ndarray, bbox: Optional[Sequence] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
        """Single RGB image + optional xyxy bbox (defaults to full image)."""
        if bbox is None:
            bbox = detect_persons(image)[0]
        kpts, scores = self.predict_batch(image[None],
                                          np.asarray(bbox, np.float32)[None])
        return kpts[0], scores[0]

    def predict_directory(self, directory: str,
                          exts=(".jpg", ".jpeg", ".png"),
                          batch_size: int = 32) -> Dict[str, Dict]:
        """Run over every image in a directory (ref inference.py dir
        mode — which predicts one image at a time; here same-shape
        images batch together up to ``batch_size``, the common case for
        extracted video frames)."""
        import cv2

        from . import native

        use_native = native.available()
        results = {}
        groups: Dict[tuple, list] = {}
        for name in sorted(os.listdir(directory)):
            if not name.lower().endswith(exts):
                continue
            path = os.path.join(directory, name)
            img = None
            lower = name.lower()
            if use_native and (lower.endswith((".jpg", ".jpeg")) or
                               (lower.endswith(".png")
                                and native.has_png())):
                try:  # single-pass decode straight to RGB
                    with open(path, "rb") as f:
                        img = native.decode_rgb(f.read())
                except (ValueError, OSError):
                    img = None  # fall through to cv2 (mislabeled format)
            if img is None:
                img = cv2.imread(path)
                if img is None:
                    continue
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            groups.setdefault(img.shape, []).append((name, img))

        for shape, items in groups.items():
            h, w = shape[:2]
            bbox = np.array([0, 0, w, h], np.float32)
            for i in range(0, len(items), batch_size):
                chunk = items[i:i + batch_size]
                frames = np.stack([im for _, im in chunk])
                kpts, scores = self.predict_batch(
                    frames, np.tile(bbox, (len(chunk), 1)))
                for (name, _), k, s in zip(chunk, kpts, scores):
                    results[name] = {"keypoints": k, "scores": s}
        return {name: results[name] for name in sorted(results)}

    def predict_video(self, video_path: str,
                      temporal_smooth: Optional[bool] = None,
                      max_frames: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray, float]:
        """Per-frame full-image pose + optional temporal smoothing.

        Returns (trajectory (T, K, 2), scores (T, K), fps).
        """
        import cv2

        cap = cv2.VideoCapture(video_path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if max_frames and len(frames) >= max_frames:
                break
        cap.release()
        if not frames:
            return (np.zeros((0, self.schema.num_keypoints, 2)),
                    np.zeros((0, self.schema.num_keypoints)), fps)
        arr = np.stack(frames)
        h, w = arr.shape[1:3]
        bboxes = np.tile(np.array([0, 0, w, h], np.float32), (len(arr), 1))
        # chunk to bound memory
        kpts_all, scores_all = [], []
        B = 32
        for i in range(0, len(arr), B):
            k, s = self.predict_batch(arr[i:i + B], bboxes[i:i + B])
            kpts_all.append(k)
            scores_all.append(s)
        traj = np.concatenate(kpts_all)
        scores = np.concatenate(scores_all)
        do_smooth = (self.cfg.temporal.enabled if temporal_smooth is None
                     else temporal_smooth)
        if do_smooth and len(traj) >= self.cfg.temporal.window_size:
            traj = np.asarray(decode_ops.temporal_smooth(
                jnp.asarray(traj), self.cfg.temporal.window_size,
                self.cfg.temporal.method, fps=fps))
        return traj, scores, fps
