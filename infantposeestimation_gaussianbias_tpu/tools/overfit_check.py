"""Hardware training sanity: overfit a tiny batch end-to-end on TPU.

Trains the fusion model (6-term Gaussian-constraint loss) on 16 fixed
synthetic crops and verifies the fusion decode recovers the keypoints —
the strongest single check that the fused train step + loss + decoder all
learn correctly on real hardware.

Round-1 result on v5e (litehrnet + fusion head @ 256x192, lr 1e-3):
initial keypoint error 64.1 px -> 2.76 px after 2005 steps (loss 167 -> 2.1).

Run: python -m infantposeestimation_gaussianbias_tpu.tools.overfit_check
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def run(steps: int = 2000, batch: int = 16, lr: float = 1e-3,
        backbone: str = "litehrnet", verbose: bool = True) -> float:
    from ..config import Config
    from ..models import build_model, decode_outputs
    from ..train import create_train_state, make_train_step

    cfg = Config()
    cfg.model.backbone = backbone
    cfg.model.head_type = "fusion"
    cfg.model.hidden_dim = 64
    cfg.model.compute_dtype = "bfloat16"
    cfg.train.lr = lr
    cfg.train.warmup_epochs = 0
    cfg.train.steps_per_epoch = 100

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, cfg.data.keypoint_schema)

    rng = np.random.RandomState(0)
    K = cfg.data.num_keypoints
    W, H = cfg.data.input_size
    data = {
        "image": jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32)),
        "keypoints": jnp.asarray(
            rng.uniform(20, min(W, H) - 20, (batch, K, 2))
            .astype(np.float32)),
        "visible": jnp.ones((batch, K), jnp.float32),
    }
    stride = W / cfg.data.heatmap_size[0]

    @jax.jit
    def train_n(state, data, key, n):
        def body(i, carry):
            st, _ = carry
            st, m = step(st, data, jax.random.fold_in(key, i))
            return st, m["total_loss"]
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    @jax.jit
    def eval_err(state, data):
        out = state.apply_fn(state.variables, data["image"], False)
        coords, _ = decode_outputs(out, "fusion")
        return jnp.mean(jnp.linalg.norm(coords * stride - data["keypoints"],
                                        axis=-1))

    e0 = float(eval_err(state, data))
    state, loss = train_n(state, data, jax.random.PRNGKey(1), steps)
    e1 = float(eval_err(state, data))
    if verbose:
        print(f"keypoint error: {e0:.2f} px -> {e1:.2f} px "
              f"(final loss {float(loss):.3f}, {steps} steps)")
    assert e1 < e0 * 0.3, f"did not overfit: {e0:.1f} -> {e1:.1f} px"
    return e1


if __name__ == "__main__":
    run()
