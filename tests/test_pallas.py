"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from infantposeestimation_gaussianbias_tpu.ops import msa
from infantposeestimation_gaussianbias_tpu.ops.pallas.window_msa import (
    window_attention_pallas,
)


@pytest.mark.parametrize("nW,H,N,hd", [(70, 2, 49, 39), (12, 4, 49, 32),
                                       (5, 1, 16, 8)])
def test_window_attention_pallas_parity(nW, H, N, hd, rng):
    q = jnp.asarray(rng.randn(nW, H, N, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(nW, H, N, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(nW, H, N, hd).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
    ref = msa.window_attention(q, k, v, bias)
    with pltpu.force_tpu_interpret_mode():
        out = window_attention_pallas(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_window_attention_pallas_no_bias(rng):
    q = jnp.asarray(rng.randn(8, 2, 49, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(8, 2, 49, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(8, 2, 49, 16).astype(np.float32))
    ref = msa.window_attention(q, k, v, None)
    with pltpu.force_tpu_interpret_mode():
        out = window_attention_pallas(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("nW,H,N,hd", [(70, 2, 49, 39), (12, 4, 49, 32),
                                       (33, 1, 49, 32), (5, 8, 49, 16)])
def test_window_attention_pallas_qkv_parity(nW, H, N, hd, rng):
    """The zero-relayout kernel must match the XLA path fed from the same
    flat (nW, N, 3C) qkv tensor."""
    from infantposeestimation_gaussianbias_tpu.ops.pallas.window_msa import (
        window_attention_pallas_qkv,
    )

    C = H * hd
    qkv = jnp.asarray(rng.randn(nW, N, 3 * C).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))

    split = qkv.reshape(nW, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
    ref = msa.window_attention(split[0], split[1], split[2], bias)
    ref = ref.transpose(0, 2, 1, 3).reshape(nW, N, C)

    with pltpu.force_tpu_interpret_mode():
        out = window_attention_pallas_qkv(qkv, bias, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)

    with pltpu.force_tpu_interpret_mode():
        out_nb = window_attention_pallas_qkv(qkv, None, H)
    ref_nb = msa.window_attention(split[0], split[1], split[2], None)
    ref_nb = ref_nb.transpose(0, 2, 1, 3).reshape(nW, N, C)
    np.testing.assert_allclose(np.asarray(out_nb), np.asarray(ref_nb),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("nW,H,N,hd", [(12, 2, 49, 32), (33, 1, 49, 16)])
def test_window_attention_pallas_qkv_grad_parity(nW, H, N, hd, rng):
    """custom-VJP (Pallas backward kernel) grads must match autodiff
    through the XLA path: d/d qkv and d/d bias."""
    from infantposeestimation_gaussianbias_tpu.ops.pallas.window_msa import (
        window_attention_pallas_qkv_vjp,
    )

    C = H * hd
    qkv = jnp.asarray(rng.randn(nW, N, 3 * C).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
    cot = jnp.asarray(rng.randn(nW, N, C).astype(np.float32))

    def ref_fn(qkv, bias):
        split = qkv.reshape(nW, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        out = msa.window_attention(split[0], split[1], split[2], bias)
        return jnp.sum(out.transpose(0, 2, 1, 3).reshape(nW, N, C) * cot)

    def pallas_fn(qkv, bias):
        out = window_attention_pallas_qkv_vjp(qkv, bias, H)
        return jnp.sum(out * cot)

    ref_dqkv, ref_dbias = jax.grad(ref_fn, argnums=(0, 1))(qkv, bias)
    with pltpu.force_tpu_interpret_mode():
        dqkv, dbias = jax.grad(pallas_fn, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(ref_dqkv),
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(ref_dbias),
                               atol=5e-3, rtol=5e-3)


def test_window_attention_module_pallas_wiring(rng):
    """WindowAttention(use_pallas=True) must match the XLA module path
    (same params) — catches layout bugs in the model wiring, not just the
    kernel contract."""
    from infantposeestimation_gaussianbias_tpu.models.hrformer import (
        WindowAttention,
    )

    x = jnp.asarray(rng.randn(12, 49, 64).astype(np.float32))
    mod_x = WindowAttention(64, 7, 2, use_pallas=False)
    mod_p = WindowAttention(64, 7, 2, use_pallas=True)
    variables = mod_x.init(jax.random.PRNGKey(0), x)
    ref = mod_x.apply(variables, x, False)
    with pltpu.force_tpu_interpret_mode():
        out = mod_p.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)
    # training path goes through the custom-VJP kernel (RPE present)
    with pltpu.force_tpu_interpret_mode():
        out_train = mod_p.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(out_train), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)
    # no-RPE training falls back to XLA (kernel-free) — must run on CPU
    mod_nr_x = WindowAttention(64, 7, 2, with_rpe=False, use_pallas=False)
    mod_nr_p = WindowAttention(64, 7, 2, with_rpe=False, use_pallas=True)
    v_nr = mod_nr_x.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(mod_nr_p.apply(v_nr, x, True)),
        np.asarray(mod_nr_x.apply(v_nr, x, True)), atol=2e-3, rtol=1e-3)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 17, 13, 8).astype(np.float32))
    wins, (Hp, Wp) = msa.window_partition(x, 7)
    assert Hp == 21 and Wp == 14
    assert wins.shape == (2 * 3 * 2, 49, 8)
    back = msa.window_reverse(wins.reshape(-1, 7, 7, 8), 7, 17, 13, Hp, Wp)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index():
    idx = msa.relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    # symmetry: rel(a, b) and rel(b, a) mirror through the table center
    assert idx[0, 0] == idx[48, 48]


def test_fused_residual_chain_matches_basic_blocks(rng):
    """Kernel output must match 4 sequential flax BasicBlocks (inference)."""
    from infantposeestimation_gaussianbias_tpu.models.layers import BasicBlock
    from infantposeestimation_gaussianbias_tpu.ops.pallas.residual_block import (
        fused_residual_chain,
        pack_basic_block_params,
    )

    B, H, W, C = 2, 16, 12, 32
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))

    blocks = [BasicBlock(C) for _ in range(4)]
    variables = []
    y_ref = x
    for i, blk in enumerate(blocks):
        v = blk.init(jax.random.PRNGKey(i), y_ref, False)
        # randomize batch stats so BN folding is non-trivial
        v = jax.tree_util.tree_map(lambda a: a, v)
        stats = v["batch_stats"]
        stats = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                np.random.RandomState(i).uniform(0.5, 1.5, a.shape)
                .astype(np.float32)), stats)
        v = {"params": v["params"], "batch_stats": stats}
        variables.append(v)
        y_ref = blk.apply(v, y_ref, False)

    ws, abs_ = pack_basic_block_params(
        [v["params"] for v in variables],
        [v["batch_stats"] for v in variables], dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = fused_residual_chain(x, ws, abs_, 4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)


class TestShardedKernel:
    """shard_map composition: the fused W-MSA kernel under a
    ('data', 'model') mesh (round-2 verdict item 3).  Uses the generic
    Pallas interpreter (window_msa.interpret_mode) — the TPU-semantics
    interpreter's cross-core barriers deadlock under shard_map on
    virtual CPU devices."""

    def _ref(self, qkv, bias, H):
        nW, N, C3 = qkv.shape
        C = C3 // 3
        hd = C // H
        q = qkv[:, :, :C].reshape(nW, N, H, hd).transpose(0, 2, 1, 3)
        k = qkv[:, :, C:2 * C].reshape(nW, N, H, hd).transpose(0, 2, 1, 3)
        v = qkv[:, :, 2 * C:].reshape(nW, N, H, hd).transpose(0, 2, 1, 3)
        out = msa.window_attention(q, k, v, bias)
        return out.transpose(0, 2, 1, 3).reshape(nW, N, C)

    @pytest.mark.parametrize("nW,H,hd", [
        (30, 4, 16),   # head-parallel on model=2, nW padded 30->32
        (13, 3, 16),   # H % model != 0 -> model axis replicates
    ])
    def test_sharded_qkv_fwd_and_grad_parity(self, nW, H, hd, rng):
        from infantposeestimation_gaussianbias_tpu.ops.pallas import (
            window_msa as wm,
        )
        from infantposeestimation_gaussianbias_tpu.parallel import create_mesh

        N = 49
        C = H * hd
        qkv = jnp.asarray(rng.randn(nW, N, 3 * C).astype(np.float32))
        bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
        mesh = create_mesh(4, 2)

        with wm.interpret_mode():
            out = wm.window_attention_pallas_qkv_sharded(qkv, bias, H, mesh)
        ref = self._ref(qkv, bias, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=1e-3)

        def loss(qkv, bias):
            return jnp.sum(jnp.sin(
                wm.window_attention_pallas_qkv_sharded(qkv, bias, H, mesh)))

        with wm.interpret_mode():
            g = jax.grad(loss, argnums=(0, 1))(qkv, bias)
        g_ref = jax.grad(
            lambda a, b: jnp.sum(jnp.sin(self._ref(a, b, H))),
            argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]),
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]),
                                   atol=2e-3, rtol=1e-3)

    def test_hrformer_forward_under_mesh_keeps_pallas(self, rng):
        """A tiny HRFormer with use_pallas=True + mesh must match the XLA
        path bit-for-tolerance on the same params — the flagship kernel
        and the flagship distribution story compose."""
        from infantposeestimation_gaussianbias_tpu.models.hrformer import (
            HRFormer,
        )
        from infantposeestimation_gaussianbias_tpu.ops.pallas import (
            window_msa as wm,
        )
        from infantposeestimation_gaussianbias_tpu.parallel import create_mesh

        mesh = create_mesh(4, 2)
        kw = dict(channels=(8, 16), num_heads=(2, 4), stage_modules=(1,),
                  num_blocks=1, drop_path_rate=0.0)
        m_xla = HRFormer(use_pallas=False, **kw)
        m_pal = HRFormer(use_pallas=True, mesh=mesh, **kw)

        x = jnp.asarray(rng.randn(8, 56, 56, 3).astype(np.float32))
        variables = m_xla.init(jax.random.PRNGKey(0), x, False)
        ref = m_xla.apply(variables, x, False)
        with wm.interpret_mode():
            out = m_pal.apply(variables, x, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=1e-3)

        # grads w.r.t. params agree between the two paths
        def loss(fn, variables, x):
            return jnp.sum(jnp.sin(fn(variables, x, False)))

        g_ref = jax.grad(lambda v: loss(m_xla.apply, v, x))(variables)
        with wm.interpret_mode():
            g = jax.grad(lambda v: loss(m_pal.apply, v, x))(variables)
        flat_ref = jax.tree_util.tree_leaves(g_ref)
        flat = jax.tree_util.tree_leaves(g)
        assert len(flat) == len(flat_ref)
        for a, b in zip(flat, flat_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3)


def test_conv3x3_wgrad_kernel_parity(rng):
    """ops/pallas/conv_wgrad.py — a documented NEGATIVE perf result
    (BENCH.md round 3: VPU realignment of the tile-misaligned tap
    shifts outweighs the wide-lane MXU win), kept parity-tested so the
    record stays honest."""
    from jax import lax

    from infantposeestimation_gaussianbias_tpu.ops.pallas import (
        conv_wgrad as cw,
    )

    for (B, H, W, Ci, Co) in [(8, 16, 12, 32, 32), (4, 8, 6, 16, 64)]:
        x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
        dy = jnp.asarray(rng.randn(B, H, W, Co).astype(np.float32))
        w0 = jnp.zeros((3, 3, Ci, Co), jnp.float32)

        def conv(w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ref = jax.vjp(conv, w0)[1](dy)[0]
        with cw.interpret_mode():
            got = cw.conv3x3_wgrad(x, dy)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
