"""End-to-end benchmark: crops/sec/chip (preprocess -> forward -> decode).

Primary metric from BASELINE.json: HRNet-W32 @ 256x192, the full
single-crop inference pipeline of /root/reference/inference.py:64-215
(affine crop from source frame + normalize + forward + sub-pixel decode +
back-projection to source coordinates), fused into ONE jit and batched.

Baseline: the reference's HRNet-W32 ~22 ms/img on an RTX 3090
(~45 img/s, /root/reference/analysis/hrnet_vs_sota_analysis.md:298).

Measurement protocol: this environment routes execution through a tunnel
with ~25 ms fixed per-dispatch overhead, and block_until_ready does not
reflect device completion, so per-call host timing is unusable.  Instead K
pipeline iterations run INSIDE one jit (lax.fori_loop with a data
dependency between iterations) ending in a scalar readback; device time
per iteration = (T_K - T_1) / (K - 1).  A chained-matmul calibration with
the same protocol measures 190 TFLOP/s on this v5e (peak 197), validating
the method.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_BATCH (default 256), BENCH_CHAIN (default 16),
BENCH_REPEATS (default 5), BENCH_QUANT (default 1: int8 PTQ serving —
the production path; AP-delta guard vs float is 0.0007 on the trained
flagship, tools/pipeline_proof.py --quantize.  Set 0 for bf16, which
serves with BN folded into the conv weights — models/fold.py, exact —
unless BENCH_FOLD=0.)

When the headline runs int8, "vs_baseline" is still computed from a
separate bf16/BN-fold float measurement so the ratio against the float
RTX 3090 baseline compares like precisions; the raw int8 ratio is
reported alongside as "vs_baseline_int8_vs_float".
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_IMG_PER_S = 45.0  # RTX 3090 HRNet-W32 (~22 ms/img)


def build(batch_size: int, quant: bool = False, fold: bool = False,
          backbone: str = "hrnet_w32"):
    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.models import (
        build_model,
        decode_outputs,
        fold_variables,
        quantize_model,
    )
    from infantposeestimation_gaussianbias_tpu.ops import affine, decode

    cfg = Config()
    cfg.model.backbone = backbone
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "bfloat16"
    # BENCH_INPUT="W,H" overrides the crop resolution (e.g. "288,384"
    # for the reference's second config, README.md:227-229)
    W_in, H_in = (int(v) for v in os.environ.get(
        "BENCH_INPUT", "192,256").split(","))
    cfg.data.input_size = (W_in, H_in)
    cfg.data.heatmap_size = (W_in // 4, H_in // 4)

    model = build_model(cfg)
    init = jax.jit(lambda rng, x: model.init(rng, x, False))
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, H_in, W_in, 3), jnp.float32))

    W, H = cfg.data.input_size
    hm_w, hm_h = cfg.data.heatmap_size

    if quant:
        # int8 PTQ serving path: calibrate on a synthetic crop batch,
        # then swap in the quantized model (ops/quant.py).
        rng0 = np.random.RandomState(7)
        calib_frames = jnp.asarray(
            rng0.randint(0, 255, (64, 512, 512, 3)).astype(np.float32))
        cc = jnp.asarray(rng0.uniform(128, 384, (64, 2)).astype(np.float32))
        cs = jnp.asarray(np.repeat(rng0.uniform(150, 400, (64, 1)), 2, 1)
                         .astype(np.float32))
        crops = affine.crop_and_normalize(calib_frames, cc, cs, (W, H))
        variables = quantize_model(cfg, variables, [crops])
        model = build_model(cfg, quant=True)
    elif fold:
        # bf16 serving with inference BN baked into conv weights (exact).
        variables = fold_variables(variables)
        model = build_model(cfg, fold=True)

    def one_crop_pass(variables, frames, centers, scales):
        crops = affine.crop_and_normalize(frames, centers, scales, (W, H))
        outputs = model.apply(variables, crops, False)
        coords, scores = decode_outputs(outputs, "fusion")
        coords = coords * jnp.asarray([W / hm_w, H / hm_h], jnp.float32)
        coords = decode.transform_preds(coords, centers, scales, (W, H))
        return coords, scores

    def chained(k: int):
        def run(variables, frames, centers, scales):
            def body(i, carry):
                c, acc = carry
                # data dependency across iterations so XLA cannot collapse
                # the loop: each pass perturbs the crop centers by a tiny
                # function of the previous coordinates.
                cc = centers + 1e-6 * jnp.mean(c, axis=1)
                coords, scores = one_crop_pass(variables, frames, cc, scales)
                return coords, acc + jnp.sum(scores)

            init_c = jnp.zeros((frames.shape[0],
                                cfg.data.num_keypoints, 2), jnp.float32)
            coords, acc = jax.lax.fori_loop(0, k, body, (init_c, 0.0))
            return jnp.sum(coords) + acc  # scalar: readback is trivial

        return _maybe_compiler_options(jax.jit(run))

    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        rng.randint(0, 255, (batch_size, 512, 512, 3)).astype(np.float32))
    centers = jnp.asarray(rng.uniform(128, 384, (batch_size, 2))
                          .astype(np.float32))
    scales = jnp.asarray(
        np.repeat(rng.uniform(150, 400, (batch_size, 1)), 2, 1)
        .astype(np.float32))
    return chained, (variables, frames, centers, scales)


def _maybe_compiler_options(jitted):
    """BENCH_COMPILER_OPTIONS='{"xla_tpu_...": "true", ...}': compile the
    jitted program with per-program PJRT compiler options.

    TPU compiler flags cannot ride XLA_FLAGS here: that env var is parsed
    by the CLIENT-side XLA (CPU + tunnel plugin), which hard-aborts on
    unknown xla_tpu_* names — the TPU compiler lives on the server side
    of the tunnel. jit(...).lower(...).compile(compiler_options=...)
    ships the overrides in CompileOptions to the real backend, which is
    also the portable (non-global, per-program) way to set them."""
    opts = os.environ.get("BENCH_COMPILER_OPTIONS", "")
    if not opts:
        return jitted
    parsed = json.loads(opts)

    box = {}

    def call(*args):
        if "c" not in box:
            box["c"] = jitted.lower(*args).compile(compiler_options=parsed)
        return box["c"](*args)

    return call


def timed(fn, args, repeats: int) -> float:
    float(fn(*args))  # compile + settle
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))  # scalar readback = hard sync
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def latency_sweep():
    """BENCH_LATENCY=1: per-batch serving latency at small batch sizes
    (the real-time/video regime the reference serves one crop at a time,
    /root/reference/inference.py:217-236).  Steady-state device latency
    via the same two-point chained protocol (host dispatch overhead is
    tunnel-dependent and excluded, as in the throughput metric); one
    JSON line per (batch, precision)."""
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    backbone = os.environ.get("BENCH_MODEL", "hrnet_w32")
    batches = [int(b) for b in os.environ.get(
        "BENCH_LATENCY_BATCHES", "1,4,16,64").split(",")]
    for bs in batches:
        chain = max(16, min(128, 512 // bs))
        for quant_ in (False, True):
            chained, args = build(bs, quant=quant_, fold=not quant_,
                                  backbone=backbone)
            t1 = timed(chained(1), args, repeats)
            tk = timed(chained(chain), args, repeats)
            per_iter = (tk - t1) / (chain - 1)
            print(json.dumps({
                "metric": "serving_latency_ms_per_batch",
                "batch_size": bs,
                "value": round(per_iter * 1e3, 3),
                "unit": "ms",
                "crops_per_sec": round(bs / per_iter, 1),
                "precision": "int8-ptq" if quant_ else "bf16-bnfold",
                "backbone": backbone,
            }), flush=True)


def main():
    bs = int(os.environ.get("BENCH_BATCH", "256"))
    chain = int(os.environ.get("BENCH_CHAIN", "16"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    quant = os.environ.get("BENCH_QUANT", "1") == "1"
    fold = os.environ.get("BENCH_FOLD", "1") == "1" and not quant
    backbone = os.environ.get("BENCH_MODEL", "hrnet_w32")
    if os.environ.get("BENCH_LATENCY", "0") == "1":
        latency_sweep()
        return

    def measure(quant_, fold_):
        chained, args = build(bs, quant=quant_, fold=fold_,
                              backbone=backbone)
        t1 = timed(chained(1), args, repeats)
        tk = timed(chained(chain), args, repeats)
        per_iter = (tk - t1) / (chain - 1)
        print(f"# {'int8' if quant_ else 'float'}: T_1={t1 * 1e3:.1f}ms "
              f"T_{chain}={tk * 1e3:.1f}ms -> {per_iter * 1e3:.2f}ms/batch "
              f"of {bs}", flush=True)
        return bs / per_iter, per_iter

    cps, per_iter = measure(quant, fold)
    if quant:
        # vs_baseline must compare like precisions: the RTX 3090 baseline
        # is a float model, so the ratio uses the bf16/BN-fold float path
        # even when the headline value is the int8 production path.
        float_cps, _ = measure(False, True)
    else:
        float_cps = cps
    W_in, H_in = (int(v) for v in os.environ.get(
        "BENCH_INPUT", "192,256").split(","))
    # The RTX-3090 baseline is HRNet-W32 at 256x192 float; a ratio
    # against any other backbone/resolution would be apples-to-oranges,
    # so vs_baseline is only emitted for the matching configuration.
    comparable = (backbone == "hrnet_w32" and (W_in, H_in) == (192, 256))
    result = {
        "metric": f"crops_per_sec_per_chip_e2e_{H_in}x{W_in}",
        "value": round(cps, 1),
        "unit": "crops/s",
        "vs_baseline": (round(float_cps / BASELINE_IMG_PER_S, 2)
                        if comparable else None),
        "batch_size": bs,
        "ms_per_batch": round(per_iter * 1e3, 3),
        "device": str(jax.devices()[0]),
        "precision": ("int8-ptq" if quant
                      else "bf16-bnfold" if fold else "bf16"),
        "backbone": backbone,
        "vs_baseline_precision": ("bf16-bnfold vs float-rtx3090"
                                  if comparable else
                                  "n/a: baseline is hrnet_w32@256x192"),
    }
    if quant:
        result["float_crops_per_sec"] = round(float_cps, 1)
        if comparable:
            result["vs_baseline_int8_vs_float"] = round(
                cps / BASELINE_IMG_PER_S, 2)
    _record_last_good(result)
    print(json.dumps(result))


_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LAST_GOOD.json")


def _record_last_good(result: dict) -> None:
    """Persist every successful headline measurement to a sidecar so a
    tunnel outage at snapshot time degrades to stale-but-honest instead
    of value=0 (BENCH_r03/r04 were both zeroed by outages)."""
    try:
        payload = dict(result)
        payload["measured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(_LAST_GOOD, "w") as f:
            json.dump(payload, f, indent=1)
    except OSError:
        pass  # never let bookkeeping fail the measurement


def _load_last_good():
    try:
        with open(_LAST_GOOD) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _device_reachable(timeout_s: float = 180.0) -> bool:
    """Probe device liveness in a CHILD process: when the axon tunnel is
    down, jax.devices() hangs uninterruptibly in C, so a hung child +
    kill is the only reliable fail-fast.  Keeps the driver artifact a
    clean JSON error instead of an rc=124 timeout."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "assert jax.devices()[0].platform != 'cpu'; "
            "print(float(jnp.ones((8, 8)).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _device_reachable_with_retry() -> bool:
    """Poll device liveness with bounded backoff before giving up.

    A transient tunnel blip at snapshot time must not zero the round
    (BENCH_r03 recorded value=0 because the one-shot probe coincided
    with an outage).  Retry for up to BENCH_PROBE_BUDGET_S (default
    600 s) with growing sleeps; fail only if the device never answers
    within the budget."""
    budget = float(os.environ.get(
        "BENCH_PROBE_BUDGET_S", os.environ.get("BENCH_BUDGET", "1200")))
    deadline = time.monotonic() + budget
    delay = 15.0
    attempt = 0
    while True:
        attempt += 1
        if _device_reachable(timeout_s=min(180.0,
                                           max(30.0, deadline
                                               - time.monotonic()))):
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        sleep_s = min(delay, remaining)
        print(f"# device probe attempt {attempt} failed; retrying in "
              f"{sleep_s:.0f}s ({remaining:.0f}s of budget left)",
              flush=True)
        time.sleep(sleep_s)
        delay = min(delay * 2, 120.0)


if __name__ == "__main__":
    if os.environ.get("BENCH_SKIP_PROBE", "0") != "1" \
            and not _device_reachable_with_retry():
        err = {"metric": "crops_per_sec_per_chip", "value": 0,
               "unit": "img/s", "vs_baseline": 0,
               "error": "TPU device unreachable for the full "
                        "probe budget (tunnel down?); no measurement"}
        last = _load_last_good()
        if last is not None:
            # Stale-but-honest: the most recent successful measurement on
            # this box, clearly labeled with its timestamp.  value stays 0
            # so the artifact cannot be mistaken for a live number.
            err["last_good"] = last
        print(json.dumps(err))
        raise SystemExit(0)
    main()
