"""Fused GEGLU→net_2 kernel (ops/geglu_matmul.py): interpreter-mode
correctness vs the XLA reference, FeedForward branch equivalence with an
identical param tree, and the guidance grad path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.ops import geglu_matmul as gg
from theatergen_tpu.models import layers


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(gg, "INTERPRET", True)


def _inputs(m=256, k=128, n=128, dtype=jnp.bfloat16):
    kq, kw = jax.random.split(jax.random.key(0))
    hg = jax.random.normal(kq, (m, 2 * k), dtype)
    w = jax.random.normal(kw, (k, n), dtype) * 0.05
    return hg, w


def test_matches_reference():
    hg, w = _inputs()
    out = gg.geglu_matmul(hg, w)
    ref = gg._reference(hg, w)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.15, rtol=0.05)


def test_full_dim_n320():
    # SD1.5's net_2 has N=320 (not a 128-multiple): full-dim trailing
    # block (Mosaic pads internally; chip compile validated in r4e)
    hg, w = _inputs(m=256, k=1280, n=320)
    out = gg.geglu_matmul(hg, w)
    ref = gg._reference(hg, w)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.5, rtol=0.05)


def test_batched_leading_dims():
    hg, w = _inputs(m=256)
    out = gg.geglu_matmul(hg.reshape(2, 128, -1), w)
    assert out.shape == (2, 128, w.shape[1])
    np.testing.assert_allclose(
        np.asarray(out.reshape(256, -1), np.float32),
        np.asarray(gg.geglu_matmul(hg, w), np.float32))


def test_grad_matches_reference():
    hg, w = _inputs(m=128)
    hgf = hg.astype(jnp.float32)

    def loss_k(h, ww):
        return jnp.sum(gg.geglu_matmul(h.astype(jnp.bfloat16), ww) ** 2)

    def loss_r(h, ww):
        return jnp.sum(gg._reference(h.astype(jnp.bfloat16), ww) ** 2)

    gk = jax.grad(loss_k)(hgf, w)
    gr = jax.grad(loss_r)(hgf, w)
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(gr, np.float32),
                               atol=0.3, rtol=0.1)


def test_feedforward_branches_identical_tree(monkeypatch):
    x = jax.random.normal(jax.random.key(1), (1, 128, 128), jnp.bfloat16)
    ff = layers.FeedForward(dtype=jnp.bfloat16)
    params_off = ff.init(jax.random.key(2), x)["params"]

    monkeypatch.setattr(gg, "FUSED", True)
    monkeypatch.setattr(gg, "supported", lambda *a: True)
    params_on = ff.init(jax.random.key(2), x)["params"]
    flat_off = jax.tree_util.tree_leaves_with_path(params_off)
    flat_on = jax.tree_util.tree_leaves_with_path(params_on)
    assert [p for p, _ in flat_off] == [p for p, _ in flat_on]
    for (_, a), (_, b) in zip(flat_off, flat_on):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_on = ff.apply({"params": params_off}, x)
    monkeypatch.setattr(gg, "FUSED", False)
    out_off = ff.apply({"params": params_off}, x)
    np.testing.assert_allclose(np.asarray(out_on, np.float32),
                               np.asarray(out_off, np.float32),
                               atol=0.1, rtol=0.05)


# --- full-FF fusion (ff_matmul): up-proj + gate + down-proj in one kernel ---


def _ff_inputs(m=256, d=128, k=256, dtype=jnp.bfloat16):
    k1, k2, k3, k4 = jax.random.split(jax.random.key(3), 4)
    x = jax.random.normal(k1, (m, d), dtype)
    w1 = jax.random.normal(k2, (d, 2 * k), dtype) * 0.05
    b1 = jax.random.normal(k3, (2 * k,), jnp.float32) * 0.1
    w2 = jax.random.normal(k4, (k, d), dtype) * 0.05
    return x, w1, b1, w2


def test_ff_matches_reference():
    x, w1, b1, w2 = _ff_inputs()
    out = gg.ff_matmul(x, w1, b1, w2)
    ref = gg._ff_reference(x, w1, b1, w2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.15, rtol=0.05)


def test_ff_d320_multi_kblock():
    # SD1.5 64^2-level shape family: d=320 (not a 128-multiple), inner
    # 1280 split over multiple k blocks
    x, w1, b1, w2 = _ff_inputs(m=256, d=320, k=1280)
    out = gg.ff_matmul(x, w1, b1, w2)
    ref = gg._ff_reference(x, w1, b1, w2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.3, rtol=0.05)


def test_ff_batched_leading_dims():
    x, w1, b1, w2 = _ff_inputs(m=256)
    out = gg.ff_matmul(x.reshape(2, 128, -1), w1, b1, w2)
    assert out.shape == (2, 128, x.shape[-1])
    np.testing.assert_allclose(
        np.asarray(out.reshape(256, -1), np.float32),
        np.asarray(gg.ff_matmul(x, w1, b1, w2), np.float32))


def test_ff_grad_matches_reference():
    x, w1, b1, w2 = _ff_inputs(m=128)
    xf = x.astype(jnp.float32)

    def loss_k(xx):
        return jnp.sum(gg.ff_matmul(xx.astype(jnp.bfloat16), w1, b1, w2) ** 2)

    def loss_r(xx):
        return jnp.sum(gg._ff_reference(xx.astype(jnp.bfloat16), w1, b1, w2) ** 2)

    gk = jax.grad(loss_k)(xf)
    gr = jax.grad(loss_r)(xf)
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(gr, np.float32),
                               atol=0.3, rtol=0.1)


def test_feedforward_full_branch_identical_tree(monkeypatch):
    x = jax.random.normal(jax.random.key(1), (1, 128, 128), jnp.bfloat16)
    ff = layers.FeedForward(dtype=jnp.bfloat16)
    params_off = ff.init(jax.random.key(2), x)["params"]

    monkeypatch.setattr(gg, "FUSED_FULL", True)
    monkeypatch.setattr(gg, "ff_supported", lambda *a: True)
    params_on = ff.init(jax.random.key(2), x)["params"]
    flat_off = jax.tree_util.tree_leaves_with_path(params_off)
    flat_on = jax.tree_util.tree_leaves_with_path(params_on)
    assert [p for p, _ in flat_off] == [p for p, _ in flat_on]
    for (_, a), (_, b) in zip(flat_off, flat_on):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_on = ff.apply({"params": params_off}, x)
    monkeypatch.setattr(gg, "FUSED_FULL", False)
    monkeypatch.setattr(gg, "FUSED", False)
    out_off = ff.apply({"params": params_off}, x)
    np.testing.assert_allclose(np.asarray(out_on, np.float32),
                               np.asarray(out_off, np.float32),
                               atol=0.1, rtol=0.05)


def test_geglu_plan_v3_matches_reference(monkeypatch):
    # pipeline-depth planner (r4k A/B): different blocks, same math
    monkeypatch.setattr(gg, "GEGLU_PLAN", "v3")
    m, k, n = 512, 1280, 320
    key1, key2 = jax.random.split(jax.random.key(7))
    hg = jax.random.normal(key1, (m, 2 * k), jnp.bfloat16)
    w = jax.random.normal(key2, (k, n), jnp.bfloat16) * 0.05
    bm, bk, bn = gg._plan(m, k, n)
    assert (m // bm) * (k // bk) >= 4  # deeper grid than whole-M v2
    out = gg.geglu_matmul(hg, w)
    value, gate = hg[:, :k].astype(jnp.float32), hg[:, k:].astype(jnp.float32)
    ref = (value * jax.nn.gelu(gate, approximate=False)).astype(
        jnp.bfloat16) @ w
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.3, rtol=0.05)


def test_ff_model_family_gate():
    # auto mode (default): full-FF fusion is a per-MODEL flag — SD1.5's
    # config turns it on (chip A/B r4i: +4.6%), SDXL's leaves the
    # v2-geglu split (full-FF measured −3.5% there, r4i/r4j)
    from theatergen_tpu.config import sd15_config, sdxl_config
    assert sd15_config().unet.fused_ff
    assert not sdxl_config().unet.fused_ff


def test_ff_force_env_overrides_model_flag(monkeypatch):
    # THEATERGEN_FUSED_FF=1 forces fusion even where the model flag is
    # off; =0 disables everywhere; "auto" defers to the flag
    captured = []

    def fake_ff_matmul(x, w1, b1, w2):
        captured.append(x.shape)
        return gg._ff_reference(x, w1, b1, w2)

    monkeypatch.setattr(gg, "_on_tpu", lambda: True)
    monkeypatch.setattr(gg, "_plan_full", lambda m, d, k: (128, 128))
    monkeypatch.setattr(gg, "ff_matmul", fake_ff_matmul)
    monkeypatch.setattr(layers.gg_ops, "ff_matmul", fake_ff_matmul)
    monkeypatch.setattr(gg, "FUSED", False)

    x = jax.random.normal(jax.random.key(1), (1, 128, 128), jnp.bfloat16)
    ff_off = layers.FeedForward(dtype=jnp.bfloat16, fused_ff=False)
    params = ff_off.init(jax.random.key(2), x)["params"]

    monkeypatch.setattr(gg, "FUSED_FULL", True)
    monkeypatch.setattr(gg, "FF_FORCE", False)
    ff_off.apply({"params": params}, x)
    assert not captured  # model flag off, auto → unfused

    ff_on = layers.FeedForward(dtype=jnp.bfloat16, fused_ff=True)
    ff_on.apply({"params": params}, x)
    assert captured      # model flag on, auto → fused

    captured.clear()
    monkeypatch.setattr(gg, "FF_FORCE", True)
    ff_off.apply({"params": params}, x)
    assert captured      # forced on despite model flag

    captured.clear()
    monkeypatch.setattr(gg, "FUSED_FULL", False)
    monkeypatch.setattr(gg, "FF_FORCE", False)
    ff_on.apply({"params": params}, x)
    assert not captured  # env "0" disables everywhere


def test_measured_blocks_table_legal():
    """Every chip-validated _MEASURED_BLOCKS entry must be a legal plan
    for its shape: dims divide, Mosaic tiling respected, VMEM budget
    honored — a typo'd entry must fail here, not at Mosaic lowering in
    a chip session."""
    import theatergen_tpu.ops.geglu_matmul as gg

    for (m, k, n), (bm, bk) in gg._MEASURED_BLOCKS.items():
        assert m % bm == 0 and k % bk == 0, (m, k, bm, bk)
        assert bm % 8 == 0 and bk % 128 == 0, (bm, bk)
        vmem = (2 * (bm * bk * 2) * 2 + (bk * n * 2) * 2
                + bm * n * 4 + bm * n * 2 * 2)
        assert vmem <= gg._VMEM_BUDGET, (m, k, n, vmem)
        # the table is consulted before the planners, so the plan the
        # kernel actually runs must BE the table entry (plan v3 default)
        if gg.GEGLU_PLAN == "v3" and gg.MEASURED_ENABLE:
            assert gg._plan(m, k, n) == (bm, bk, n)


def test_measured_blocks_env_disable(monkeypatch):
    """THEATERGEN_GEGLU_MEASURED=0 must restore the pure planner pick
    (the sweep/triage contract, BENCH_NOTES r5f)."""
    import importlib

    import theatergen_tpu.ops.geglu_matmul as gg

    monkeypatch.setenv("THEATERGEN_GEGLU_MEASURED", "0")
    gg2 = importlib.reload(gg)
    try:
        assert not gg2.MEASURED_ENABLE
        # at the measured shape the planner's organic pick differs from
        # the table entry (that difference is what r5c measured)
        assert gg2._plan(2048, 5120, 1280) == (512, 1024, 1280)
    finally:
        monkeypatch.delenv("THEATERGEN_GEGLU_MEASURED")
        importlib.reload(gg)
