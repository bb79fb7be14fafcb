"""Fused HRFormer half-block kernels: parity vs the unfused path.

The fused kernels (ops/pallas/fused_block.py) collapse LN -> attention
-> residual and LN -> MLP -> residual into single pallas_calls; these
tests pin them (interpret mode, CPU) against jnp references that
reproduce the unfused path's math, including the reference's window
zero-pad semantics, and against the real HRFormerBlock module.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from infantposeestimation_gaussianbias_tpu.ops import msa
from infantposeestimation_gaussianbias_tpu.ops.pallas.fused_block import (
    _gelu_tanh,
    fused_attn_half,
    fused_mlp_half,
)


def _ln_ref(x, gamma, beta, eps=1e-5):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _mlp_ref(x2, gamma, beta, w1, b1, w2, b2, dp_vec, tps):
    ln = _ln_ref(x2, gamma, beta)
    h = ln.astype(jnp.bfloat16) @ w1 + b1
    g = _gelu_tanh(h.astype(jnp.float32))
    o = g.astype(jnp.bfloat16) @ w2 + b2
    M = x2.shape[0]
    dp2 = dp_vec[0, jnp.arange(M) // tps][:, None]
    return (x2.astype(jnp.float32) + dp2 * o.astype(jnp.float32)).astype(
        x2.dtype)


def _mlp_args(rng, M=100, C=32, hidden=128, tps=25):
    dp_vec = np.zeros((1, 128), np.float32)
    nb = -(-M // tps)
    dp_vec[0, :nb] = (rng.rand(nb) > 0.3).astype(np.float32) / 0.7
    return (
        jnp.asarray(rng.randn(M, C).astype(np.float32), jnp.bfloat16),
        jnp.asarray(rng.randn(1, C).astype(np.float32)),
        jnp.asarray(rng.randn(1, C).astype(np.float32)),
        jnp.asarray(0.1 * rng.randn(C, hidden).astype(np.float32),
                    jnp.bfloat16),
        jnp.asarray(0.1 * rng.randn(1, hidden).astype(np.float32)),
        jnp.asarray(0.1 * rng.randn(hidden, C).astype(np.float32),
                    jnp.bfloat16),
        jnp.asarray(0.1 * rng.randn(1, C).astype(np.float32)),
        jnp.asarray(dp_vec),
        tps,
    )


def test_fused_mlp_half_forward(rng):
    args = _mlp_args(rng)
    ref = _mlp_ref(*args)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp_half(*args)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_fused_mlp_half_grads(rng):
    args = _mlp_args(rng, M=40, C=16, hidden=64, tps=10)
    probe = jnp.asarray(rng.randn(40, 16).astype(np.float32), jnp.bfloat16)

    def loss(fn):
        def inner(x2, gamma, beta, w1, b1, w2, b2):
            y = fn(x2, gamma, beta, w1, b1, w2, b2, args[7], args[8])
            return jnp.sum(y.astype(jnp.float32) * probe.astype(jnp.float32))
        return inner

    ref_g = jax.grad(loss(_mlp_ref), argnums=tuple(range(7)))(*args[:7])
    with pltpu.force_tpu_interpret_mode():
        out_g = jax.grad(loss(fused_mlp_half),
                         argnums=tuple(range(7)))(*args[:7])
    for i, (a, b) in enumerate(zip(out_g, ref_g)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=f"grad argument {i}")


def test_fused_mlp_gelu_tanh_vs_erf_below_bf16(rng):
    """The in-kernel tanh GELU must be bf16-indistinguishable from the
    XLA exact-erf GELU (the documented deviation bound)."""
    h = jnp.asarray(np.linspace(-6, 6, 4001), jnp.float32)
    exact = jax.nn.gelu(h, approximate=False)
    approx = _gelu_tanh(h)
    # absolute gap < 2^-8 * max|activation| scale used in the blocks
    assert float(jnp.max(jnp.abs(exact - approx))) < 4e-3


def _attn_ref(x, gamma, beta, wqkv, bqkv, rpe, wproj, bproj, dp_b, heads,
              ws):
    """Unfused reference: LN -> partition(zero pad) -> qkv -> W-MSA(+rpe)
    -> proj -> reverse -> droppath residual (the HRFormerBlock first
    half, models/hrformer.py)."""
    B, H, W, C = x.shape
    ln = _ln_ref(x, gamma, beta)
    wins, (Hp, Wp) = msa.window_partition(ln.astype(jnp.bfloat16), ws)
    qkv = wins.astype(jnp.bfloat16) @ wqkv + bqkv
    nW, N, _ = qkv.shape
    hd = C // heads
    split = qkv.reshape(nW, N, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    o = msa.window_attention(split[0], split[1], split[2], rpe)
    o = o.transpose(0, 2, 1, 3).reshape(nW, N, C)
    po = o.astype(jnp.bfloat16) @ wproj + bproj
    po = po.reshape(nW, ws, ws, C)
    y = msa.window_reverse(po, ws, H, W, Hp, Wp)
    return (x.astype(jnp.float32)
            + dp_b[:, None, None, None] * y.astype(jnp.float32)).astype(
                x.dtype)


def _attn_args(rng, B=2, H=10, W=9, C=16, heads=2, ws=4):
    return dict(
        x=jnp.asarray(rng.randn(B, H, W, C).astype(np.float32),
                      jnp.bfloat16),
        gamma=jnp.asarray(rng.randn(1, C).astype(np.float32)),
        beta=jnp.asarray(rng.randn(1, C).astype(np.float32)),
        wqkv=jnp.asarray(0.1 * rng.randn(C, 3 * C).astype(np.float32),
                         jnp.bfloat16),
        bqkv=jnp.asarray(0.1 * rng.randn(1, 3 * C).astype(np.float32)),
        rpe=jnp.asarray(rng.randn(heads, ws * ws, ws * ws)
                        .astype(np.float32)),
        wproj=jnp.asarray(0.1 * rng.randn(C, C).astype(np.float32),
                          jnp.bfloat16),
        bproj=jnp.asarray(0.1 * rng.randn(1, C).astype(np.float32)),
        dp_b=jnp.asarray((rng.rand(B) > 0.3).astype(np.float32) / 0.7),
        heads=heads, ws=ws)


def _run_fused_attn(a):
    B, H, W, C = a["x"].shape
    ws = a["ws"]
    xw, (Hp, Wp) = msa.window_partition(a["x"], ws)
    nW = xw.shape[0]
    dp_vec = jnp.pad(a["dp_b"], (0, 128 - B))[None]
    yw = fused_attn_half(xw, a["gamma"], a["beta"], a["wqkv"], a["bqkv"],
                         a["rpe"], a["wproj"], a["bproj"], dp_vec,
                         a["heads"], (H, W, ws))
    return msa.window_reverse(yw.reshape(nW, ws, ws, C), ws, H, W, Hp, Wp)


@pytest.mark.parametrize("H,W", [(10, 9), (8, 8), (5, 13)])
def test_fused_attn_half_forward(rng, H, W):
    """Includes non-divisible window geometries — boundary windows must
    reproduce the reference zero-pad semantics exactly."""
    a = _attn_args(rng, H=H, W=W)
    ref = _attn_ref(a["x"], a["gamma"], a["beta"], a["wqkv"], a["bqkv"],
                    a["rpe"], a["wproj"], a["bproj"], a["dp_b"],
                    a["heads"], a["ws"])
    with pltpu.force_tpu_interpret_mode():
        out = _run_fused_attn(a)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_fused_attn_half_grads(rng):
    a = _attn_args(rng, B=2, H=6, W=7, C=8, heads=2, ws=3)
    probe = jnp.asarray(rng.randn(2, 6, 7, 8).astype(np.float32))
    names = ["x", "gamma", "beta", "wqkv", "bqkv", "rpe", "wproj", "bproj"]

    def loss_ref(*arrs):
        kw = dict(zip(names, arrs))
        y = _attn_ref(kw["x"], kw["gamma"], kw["beta"], kw["wqkv"],
                      kw["bqkv"], kw["rpe"], kw["wproj"], kw["bproj"],
                      a["dp_b"], a["heads"], a["ws"])
        return jnp.sum(y.astype(jnp.float32) * probe)

    def loss_fused(*arrs):
        kw = dict(a)
        kw.update(dict(zip(names, arrs)))
        y = _run_fused_attn(kw)
        return jnp.sum(y.astype(jnp.float32) * probe)

    arrs = [a[n] for n in names]
    ref_g = jax.grad(loss_ref, argnums=tuple(range(8)))(*arrs)
    with pltpu.force_tpu_interpret_mode():
        out_g = jax.grad(loss_fused, argnums=tuple(range(8)))(*arrs)
    for name, ga, gb in zip(names, out_g, ref_g):
        np.testing.assert_allclose(
            np.asarray(ga, np.float32), np.asarray(gb, np.float32),
            atol=6e-2, rtol=6e-2, err_msg=f"grad wrt {name}")


def test_hrformer_block_fused_matches_unfused(rng, monkeypatch):
    """Model-level: the fused apply path must match the unfused path on
    the same parameter tree (eval mode; bf16 tolerance + the documented
    tanh-GELU deviation)."""
    from infantposeestimation_gaussianbias_tpu.models.hrformer import (
        HRFormerBlock,
    )

    monkeypatch.setenv("IPE_FUSED_BLOCK", "1")  # force past the C gate
    x = jnp.asarray(rng.randn(2, 10, 9, 16).astype(np.float32),
                    jnp.bfloat16)
    blk_ref = HRFormerBlock(16, 2, window_size=4, dtype=jnp.bfloat16,
                            use_pallas=False)
    variables = blk_ref.init(jax.random.PRNGKey(0), x, False)
    ref = blk_ref.apply(variables, x, False)

    blk_fused = HRFormerBlock(16, 2, window_size=4, dtype=jnp.bfloat16,
                              use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        out = blk_fused.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=4e-2, rtol=4e-2)


def test_hrformer_window_size_variant_plumbs(rng):
    """cfg.model.hrformer_window_size reaches the backbone: ws=8 changes
    the RPE table to (2*8-1)^2 rows (shape-level check via eval_shape —
    the TPU-native window variant, BENCH.md round 5)."""
    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.models import build_model

    cfg = Config()
    cfg.model.backbone = "hrformer_small"
    cfg.model.hrformer_window_size = 8
    model = build_model(cfg)
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 64, 48, 3)), False),
        jax.random.PRNGKey(0))
    t = shapes["params"]["backbone"]["stage2_module0"]["branch0_block0"][
        "attn"]["rpe_table"]
    assert t.shape == ((2 * 8 - 1) ** 2, 1)


def test_hrformer_block_fused_grads_flow_to_params(rng, monkeypatch):
    """The fused apply path reads params via get_variable — this must
    not break autodiff: grads wrt EVERY param of the block must match
    the unfused path (guards silent zero-grad training)."""
    from infantposeestimation_gaussianbias_tpu.models.hrformer import (
        HRFormerBlock,
    )

    monkeypatch.setenv("IPE_FUSED_BLOCK", "1")
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32),
                    jnp.bfloat16)
    blk_ref = HRFormerBlock(16, 2, window_size=4, dtype=jnp.bfloat16,
                            use_pallas=False)
    variables = blk_ref.init(jax.random.PRNGKey(0), x, False)
    probe = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))

    def loss(blk):
        def inner(params):
            y = blk.apply({"params": params}, x, False)
            return jnp.sum(y.astype(jnp.float32) * probe)
        return inner

    g_ref = jax.grad(loss(blk_ref))(variables["params"])
    blk_fused = HRFormerBlock(16, 2, window_size=4, dtype=jnp.bfloat16,
                              use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss(blk_fused))(variables["params"])

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    assert len(flat_ref) == len(flat_fused)
    for path, ref_leaf in flat_ref:
        got = flat_fused[path]
        name = jax.tree_util.keystr(path)
        # every param must actually receive gradient through the fused path
        assert float(jnp.max(jnp.abs(got))) > 0.0, f"zero grad: {name}"
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref_leaf, np.float32),
            atol=8e-2, rtol=8e-2, err_msg=f"grad wrt {name}")
