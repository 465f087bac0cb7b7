"""Parity tests for the weights-resident Pallas training forward scan
(kernels/train_scan.py) against the XLA custom-VJP forward
(models/decoder_vjp.py) — interpret mode on CPU.

The kernel accumulates in fp32 where the XLA bf16 path downcasts between
its two gate dots, so values agree to bf16 round-off, not bitwise;
dropout keep masks use the identical key derivation, so the dropout
PATTERN (which units are zeroed) must match exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.models import decoder_vjp, tacotron2

B, T_IN, T_STEPS = 8, 24, 5


def small_cfg(**kw):
    base = dict(
        n_symbols=40, symbols_embedding_dim=128, encoder_embedding_dim=128,
        encoder_n_convolutions=1, attention_rnn_dim=128,
        decoder_rnn_dim=128, prenet_dim=128, attention_dim=128,
        attention_location_n_filters=4, attention_location_kernel_size=7,
        n_mel_channels=16, compute_dtype="bfloat16",
        custom_vjp_decoder=True,
        # round-3 outcome: fwd+bwd kernels are ON by default (config.py),
        # with the bwd kernel quality-gated by bwd_supported's fp32
        # d_processed accumulator check; set explicitly here so the
        # parity tests stay pinned even if the default ever changes
        pallas_train_scan_bwd=True)
    base.update(kw)
    return Tacotron2Config(**base)


def make_inputs(cfg, seed=0):
    r = np.random.RandomState(seed)
    params, _ = tacotron2.init_params(jax.random.PRNGKey(seed), cfg)
    dp = params["decoder"]
    core = {
        "attention_rnn": dp["attention_rnn"],
        "attention": {k: dp["attention"][k]
                      for k in ("query", "v", "location_conv",
                                "location_dense")},
        "decoder_rnn": dp["decoder_rnn"],
    }
    prenet = jnp.asarray(r.randn(T_STEPS, B, cfg.prenet_dim), jnp.float32) * .3
    memory = jnp.asarray(r.randn(B, T_IN, cfg.encoder_embedding_dim),
                         jnp.float32) * .3
    proc = jnp.asarray(r.randn(B, T_IN, cfg.attention_dim), jnp.float32) * .3
    lengths = np.full((B,), T_IN)
    lengths[B // 2:] = T_IN - 5
    mask = jnp.arange(T_IN)[None, :] < jnp.asarray(lengths)[:, None]
    return core, prenet, memory, proc, mask


def run(cfg, training, rng, seed=0):
    core, prenet, memory, proc, mask = make_inputs(cfg, seed)
    return decoder_vjp.core_scan(core, prenet, memory, proc, mask, rng,
                                 cfg, training)


@pytest.mark.parametrize("training", [False, True])
def test_forward_parity(training):
    from tacotron2_tpu.kernels import train_scan
    # guard against the parity check becoming vacuous via silent fallback
    assert train_scan.supported(small_cfg(), T_IN, B)
    rng = jax.random.PRNGKey(3) if training else None
    ref = run(small_cfg(pallas_train_scan=False), training, rng)
    got = run(small_cfg(pallas_train_scan=True), training, rng)
    for r, g, name in zip(ref, got, ("dec_h", "ctx", "align")):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        assert g.shape == r.shape, name
        np.testing.assert_allclose(g, r, atol=5e-2, rtol=0.1,
                                   err_msg=name)
    # alignments are probabilities — tighter check plus normalization
    np.testing.assert_allclose(np.asarray(got[2]).sum(-1), 1.0, atol=1e-5)


def test_dropout_pattern_bit_identical():
    """Keep-mask derivation matches the XLA scan: zeroed units in the
    saved post-dropout hidden stacks line up exactly."""
    rng = jax.random.PRNGKey(11)

    def stacks(pallas):
        cfg = small_cfg(pallas_train_scan=pallas)
        core, prenet, memory, proc, mask = make_inputs(cfg)
        fn = decoder_vjp._make_core_scan(cfg, dropout_active=True)
        # reach the residuals via jax.vjp's saved forward
        out = fn(core, prenet, memory, proc, mask, rng)
        return out[0]  # dec_h stack (post-dropout)

    ref = np.asarray(stacks(False), np.float32)
    got = np.asarray(stacks(True), np.float32)
    np.testing.assert_array_equal(got == 0.0, ref == 0.0)


def test_grad_parity():
    """Gradients through the custom VJP with kernel-forward residuals
    agree with the XLA-forward residual path (same hand-written bwd)."""
    rng = jax.random.PRNGKey(5)

    def loss_fn(cfg):
        core, prenet, memory, proc, mask = make_inputs(cfg)

        def f(core, prenet, memory, proc):
            h, c, w = decoder_vjp.core_scan(core, prenet, memory, proc,
                                            mask, rng, cfg, True)
            return (jnp.sum(h * 1e-2) + jnp.sum(c * 1e-2)
                    + jnp.sum(w * 1e-2))
        return jax.grad(f, argnums=(0, 1, 2, 3))(core, prenet, memory,
                                                 proc)

    ref = loss_fn(small_cfg(pallas_train_scan=False))
    got = loss_fn(small_cfg(pallas_train_scan=True))
    flat_r, tree_r = jax.tree.flatten(ref)
    flat_g, tree_g = jax.tree.flatten(got)
    assert tree_r == tree_g, (tree_r, tree_g)
    assert [r.shape for r in flat_r] == [g.shape for g in flat_g]
    for r, g in zip(flat_r, flat_g):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        scale = max(np.abs(r).max(), 1e-3)
        np.testing.assert_allclose(g / scale, r / scale, atol=8e-2)


@pytest.mark.slow  # multi-tile parity: slow tier + on-HW harness
def test_long_text_parity():
    """T_in > 128 (the 192-symbol bucket) runs through the kernels'
    multi-tile path — round 3's headline capability. Forward AND
    gradient parity vs the XLA scan at T_in=150 (t_pad=192, 3 tiles)."""
    global T_IN
    from tacotron2_tpu.kernels import train_scan
    old_t = T_IN
    T_IN = 150
    try:
        assert train_scan.supported(small_cfg(), T_IN, B)
        rng = jax.random.PRNGKey(7)
        ref = run(small_cfg(pallas_train_scan=False), True, rng)
        got = run(small_cfg(pallas_train_scan=True), True, rng)
        for r, g, name in zip(ref, got, ("dec_h", "ctx", "align")):
            r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
            assert g.shape == r.shape, name
            np.testing.assert_allclose(g, r, atol=5e-2, rtol=0.1,
                                       err_msg=name)

        def loss_fn(cfg):
            core, prenet, memory, proc, mask = make_inputs(cfg)

            def f(core, prenet, memory, proc):
                h, c, w = decoder_vjp.core_scan(core, prenet, memory,
                                                proc, mask, rng, cfg,
                                                True)
                return (jnp.sum(h * 1e-2) + jnp.sum(c * 1e-2)
                        + jnp.sum(w * 1e-2))
            return jax.grad(f, argnums=(0, 1, 2, 3))(core, prenet,
                                                     memory, proc)

        gref = loss_fn(small_cfg(pallas_train_scan=False))
        ggot = loss_fn(small_cfg(pallas_train_scan=True))
        flat_r, tree_r = jax.tree.flatten(gref)
        flat_g, tree_g = jax.tree.flatten(ggot)
        assert tree_r == tree_g
        for r, g in zip(flat_r, flat_g):
            r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
            scale = max(np.abs(r).max(), 1e-3)
            np.testing.assert_allclose(g / scale, r / scale, atol=8e-2)
    finally:
        T_IN = old_t


@pytest.mark.slow  # batch-tile parity: slow tier + on-HW harness
def test_batch_tiled_parity():
    """B > 128 runs as uniform 128-row batch tiles over the grid's
    leading dim (round 3, VERDICT task 2). Forward + gradient parity at
    B=256 (2 tiles)."""
    global B
    from tacotron2_tpu.kernels import train_scan
    old_b = B
    B = 256
    try:
        assert train_scan.supported(small_cfg(), T_IN, B)
        rng = jax.random.PRNGKey(9)
        ref = run(small_cfg(pallas_train_scan=False), True, rng)
        got = run(small_cfg(pallas_train_scan=True), True, rng)
        for r, g, name in zip(ref, got, ("dec_h", "ctx", "align")):
            r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
            assert g.shape == r.shape, name
            np.testing.assert_allclose(g, r, atol=5e-2, rtol=0.1,
                                       err_msg=name)

        def loss_fn(cfg):
            core, prenet, memory, proc, mask = make_inputs(cfg)

            def f(core, prenet, memory, proc):
                h, c, w = decoder_vjp.core_scan(core, prenet, memory,
                                                proc, mask, rng, cfg,
                                                True)
                return (jnp.sum(h * 1e-2) + jnp.sum(c * 1e-2)
                        + jnp.sum(w * 1e-2))
            return jax.grad(f, argnums=(0, 1, 2, 3))(core, prenet,
                                                     memory, proc)

        gref = loss_fn(small_cfg(pallas_train_scan=False))
        ggot = loss_fn(small_cfg(pallas_train_scan=True))
        for r, g in zip(jax.tree.leaves(gref), jax.tree.leaves(ggot)):
            r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
            scale = max(np.abs(r).max(), 1e-3)
            np.testing.assert_allclose(g / scale, r / scale, atol=8e-2)
    finally:
        B = old_b


def test_supported_envelope():
    """The gate judges the TRACE-TIME batch — the batch dimension the
    Pallas grid is actually built from (ADVICE r3: the old per-shard
    candidate acceptance could approve shapes whose trace-time build
    exceeded VMEM, or silently skip the fp32 d_processed accumulator)."""
    from tacotron2_tpu.kernels import train_scan
    cfg = small_cfg()
    assert train_scan.supported(cfg, 128, 128)
    assert train_scan.supported(cfg, 24, 8)
    assert train_scan.supported(cfg, 192, 128)         # r3: 192 bucket
    assert train_scan.supported(cfg, 256, 64)          # r3: full 256
    # VMEM: a 128-row batch tile @ t_pad 256 exceeds the backward budget
    assert not train_scan.supported(cfg, 256, 128)
    assert not train_scan.supported(cfg, 300, 64)      # T_in > 256
    assert not train_scan.supported(cfg, 128, 12)      # B % 8
    # batch tiles (B > 128): the per-tile bconst blocks double-buffer,
    # so the on-chip VMEM boundary is t_pad <= 64 (round 5 measured:
    # B=256 x t_pad=128 is 7 MB over with either backward form)
    assert not train_scan.supported(cfg, 128, 256)
    assert train_scan.supported(cfg, 64, 256)          # verified on chip
    assert not train_scan.supported(cfg, 128, 200)     # non-uniform tile
    assert train_scan.supported(cfg, 64, 512)          # 4 uniform tiles
    assert not train_scan.supported(cfg, 128, 512)
    assert not train_scan.supported(cfg, 128, 1024)    # > 512: XLA path
    # 128-row tiles at t_pad 256 would exceed VMEM at trace time — this
    # exact shape used to be accepted via the per-shard candidate and
    # then crashed (or mis-built) the Mosaic compile
    assert not train_scan.supported(cfg, 256, 256)
    # the gate no longer consults the device count / mesh: same verdict
    # under any mesh_shape
    assert not train_scan.supported(cfg.replace(mesh_shape=(1, 2)),
                                    256, 128)
    assert train_scan.supported(cfg.replace(mesh_shape=(2, 1)), 64, 256)
    # backward quality gate (round-3 root cause): the bwd kernel only
    # runs where the fp32 d_processed accumulator fits, judged on the
    # SAME trace-time batch the kernel builds with
    assert train_scan.bwd_supported(cfg, 128, 128)
    assert train_scan.bwd_supported(cfg, 24, 8)
    assert train_scan.supported(cfg, 192, 128)           # fwd ok at 192
    assert train_scan.bwd_supported(cfg, 192, 64)        # 64*192 fits
    # round 4: the full kernel path covers the real workload's longest
    # bucket — the fp32 accumulator fits 128x192 after the d_M stream
    # removal + d_band slab trim (VERDICT r3 #2)
    assert train_scan.bwd_supported(cfg, 192, 128)
    assert not train_scan.bwd_supported(cfg, 256, 128)   # beyond the cap
    assert not train_scan.supported(cfg.replace(compute_dtype="float32"),
                                    128, 128)
    assert not train_scan.supported(cfg.replace(attention_dim=96), 128, 128)
    assert not train_scan.supported(
        cfg.replace(decoder_interleave=2), 128, 128)
    # full-size production config qualifies
    assert train_scan.supported(
        Tacotron2Config(compute_dtype="bfloat16"), 128, 128)


def test_grad_error_vs_fp32_ground_truth():
    """The kernel path's gradient error vs fp32 autodiff must be of the
    same order as the XLA bf16 path's own bf16 error — i.e. the kernels
    add round-off, not bugs."""
    rng = jax.random.PRNGKey(5)

    def grads(cfg):
        core, prenet, memory, proc, mask = make_inputs(cfg)

        def f(core, prenet, memory, proc):
            h, c, w = decoder_vjp.core_scan(core, prenet, memory, proc,
                                            mask, rng, cfg, True)
            return (jnp.sum(h * 1e-2) + jnp.sum(c * 1e-2)
                    + jnp.sum(w * 1e-2))
        return jax.grad(f, argnums=(0, 1, 2, 3))(core, prenet, memory,
                                                 proc)

    g_f32 = grads(small_cfg(compute_dtype="float32",
                            pallas_train_scan=False))
    g_xla = grads(small_cfg(pallas_train_scan=False))
    g_ker = grads(small_cfg(pallas_train_scan=True))
    for f32l, xlal, kerl in zip(jax.tree.leaves(g_f32),
                                jax.tree.leaves(g_xla),
                                jax.tree.leaves(g_ker)):
        f32a = np.asarray(f32l, np.float32)
        scale = np.linalg.norm(f32a) + 1e-6
        err_xla = np.linalg.norm(np.asarray(xlal, np.float32) - f32a)
        err_ker = np.linalg.norm(np.asarray(kerl, np.float32) - f32a)
        # kernels may differ in round-off placement; allow 3x + epsilon
        assert err_ker <= 3.0 * err_xla + 2e-3 * scale, (
            err_ker / scale, err_xla / scale)


def test_attention_param_grads_dband_chain_rule():
    """Round 4: the location conv/dense gradients recovered from the
    in-kernel d_band accumulator must equal autodiff through the SAME
    band fold pack_weights performs (the loss depends on conv/dense only
    through the folded band, so the bilinear chain rule is exact)."""
    import jax
    from tacotron2_tpu.kernels.train_scan import (
        CS, ScanDims, TT, _band_constants, attention_param_grads)
    r = np.random.RandomState(0)
    T_steps, Bs, T, datt, nF, ks = 6, 2, 16, 8, 4, 5
    dims = ScanDims(p=8, e=8, a=8, d=8, datt=datt, ks=ks, t_pad=T,
                    k1=24, k2=24)
    ck = jnp.asarray(r.randn(ks, 2, nF), jnp.float32)
    ld = jnp.asarray(r.randn(nF, datt), jnp.float32)
    core = {"attention": {
        "location_conv": {"kernel": ck},
        "location_dense": {"kernel": ld},
    }}
    att_h = jnp.asarray(r.randn(T_steps, Bs, 8), jnp.float32)
    dq = jnp.asarray(r.randn(T_steps, Bs, datt), jnp.float32)
    dband = jnp.asarray(r.randn(2 * CS + datt, TT * datt), jnp.float32)
    dv = jnp.zeros((8, TT * datt), jnp.float32)
    got = attention_param_grads(core, dims, att_h, dq, dband, dv)

    # autodiff reference: vjp of the pack_weights band fold (window
    # slabs only; the qsel block is constant and must be ignored)
    Ew, qsel, _ = _band_constants(dims)

    def fold(ck_, ld_):
        K2 = jnp.einsum("kcf,fD->kcD", ck_, ld_)
        band = jnp.zeros((dims.cat_w, dims.ttd), jnp.float32)
        for c in range(2):
            b3 = jnp.einsum("kjt,kd->jtd", Ew, K2[:, c])
            band = jax.lax.dynamic_update_slice(
                band, b3.reshape(dims.w_win, dims.ttd), (c * CS, 0))
        band = jax.lax.dynamic_update_slice(band, qsel, (2 * CS, 0))
        return band

    _, vjp = jax.vjp(fold, ck, ld)
    ref_ck, ref_ld = vjp(dband)
    np.testing.assert_allclose(np.asarray(got["location_conv"]["kernel"]),
                               np.asarray(ref_ck), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["location_dense"]["kernel"]),
                               np.asarray(ref_ld), rtol=1e-4, atol=1e-4)


def test_kernel_config_engages_kernel(monkeypatch):
    """(a) the stock ``Tacotron2Config()`` (bf16, custom-VJP) is inside
    the kernel envelope for every text bucket, so enabling the kernels
    is the single flag ``pallas_train_scan=true``; (b) a train step with
    that flag actually invokes the Pallas forward (observed via
    monkeypatch), not the XLA fallback. Round-3 outcome: fwd AND bwd
    kernels default ON (config.py), quality-gated by bwd_supported's
    fp32 d_processed check; the default-path QUALITY is covered by the
    tone-corpus gate (tools/synthesis_check.py)."""
    from tacotron2_tpu.config import Tacotron2Config, create_config
    from tacotron2_tpu.kernels import train_scan
    from tacotron2_tpu.training.state import create_train_state, train_step
    from __graft_entry__ import _make_batch

    default = create_config(None)  # what the CLI builds with no hparams
    assert default.custom_vjp_decoder
    assert default.compute_dtype == "bfloat16"
    # shipped default: full fwd+bwd kernel path ON (quality-gated: the
    # bwd kernel engages only where the fp32 d_processed accumulator
    # fits — the round-3 root cause and fix, config.py)
    assert default.pallas_train_scan and default.pallas_train_scan_bwd
    for bucket in default.text_buckets:
        assert train_scan.supported(default, bucket, default.batch_size), \
            bucket

    calls = []
    real = train_scan.forward_residuals

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(train_scan, "forward_residuals", spy)
    cfg = small_cfg()  # default flags, 128-aligned small dims
    assert cfg.pallas_train_scan  # inherited default
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg, B=8, T_in=24, T_out=8)
    # jit: one compiled graph instead of eagerly dispatching every op of
    # the full step on CPU (cuts this test from ~80s to seconds); the
    # spy records the kernel-path call at trace time
    step = jax.jit(lambda s, b, r: train_step(s, b, r, cfg)[1])
    metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))
    assert calls, "default-config train step fell back to the XLA scan"


@pytest.mark.slow
def test_sharded_step_with_kernel_8dev():
    """The kernel path composes with the dp-sharded pjit train step on
    the 8-virtual-device mesh (interpret lowering — validates sharded
    semantics; real multi-chip Mosaic partitioning needs a pod)."""
    from tacotron2_tpu.kernels import train_scan
    from tacotron2_tpu.parallel import (create_mesh, create_sharded_state,
                                        make_train_step)
    from __graft_entry__ import _make_batch
    import jax

    # per-shard batch must satisfy the envelope: 64 over dp=8 -> 8/shard
    cfg = small_cfg(batch_size=64, pallas_train_scan=True,
                    mesh_shape=(8, 1))
    assert train_scan.supported(cfg, 16, 64)
    mesh = create_mesh((8, 1))
    state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_train_step(cfg, mesh, state)
    batch = _make_batch(cfg, B=64, T_in=16, T_out=8)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))


def test_forward_parity_even_steps_ku2(monkeypatch):
    """ku=2 time-unrolled forward grid (two decoder steps per grid
    iteration, round 5; shipped TIME_UNROLL=1 after the on-chip
    refutation — the machinery stays parity-tested here) must match the
    XLA scan exactly like the ku=1 path."""
    from tacotron2_tpu.kernels import train_scan
    monkeypatch.setattr(train_scan, "TIME_UNROLL", 2)
    cfg_ref = small_cfg(pallas_train_scan=False)
    cfg_k = small_cfg(pallas_train_scan=True)
    core, _, memory, proc, mask = make_inputs(cfg_k)
    r = np.random.RandomState(7)
    prenet6 = jnp.asarray(r.randn(6, B, cfg_k.prenet_dim),
                          jnp.float32) * .3
    rng = jax.random.PRNGKey(3)
    ref = decoder_vjp.core_scan(core, prenet6, memory, proc, mask, rng,
                                cfg_ref, True)
    got = decoder_vjp.core_scan(core, prenet6, memory, proc, mask, rng,
                                cfg_k, True)
    for rr, g, name in zip(ref, got, ("dec_h", "ctx", "align")):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(rr, np.float32),
                                   atol=5e-2, rtol=0.1, err_msg=name)


def test_grad_parity_even_steps_ku2_feat_stream(monkeypatch):
    """Gradient parity through the ku=2 forward + feat-streaming
    backward (T_steps even): kernel-path grads track the XLA-path grads."""
    from tacotron2_tpu.kernels import train_scan
    monkeypatch.setattr(train_scan, "TIME_UNROLL", 2)
    cfg_ref = small_cfg(pallas_train_scan=False)
    cfg_k = small_cfg(pallas_train_scan=True, pallas_train_scan_bwd=True,
                      pallas_stream_feat=True)
    core, _, memory, proc, mask = make_inputs(cfg_k)
    r = np.random.RandomState(8)
    prenet6 = jnp.asarray(r.randn(6, B, cfg_k.prenet_dim),
                          jnp.float32) * .3
    rng = jax.random.PRNGKey(5)

    def loss(cfg):
        def f(c, p, m, pr):
            dh, cx, al = decoder_vjp.core_scan(c, p, m, pr, mask, rng,
                                               cfg, True)
            return (jnp.sum(dh.astype(jnp.float32) ** 2)
                    + jnp.sum(cx.astype(jnp.float32) * 0.5)
                    + jnp.sum(al ** 2))
        return jax.grad(f, argnums=(0, 1))(core, prenet6, memory, proc)

    g_ref = loss(cfg_ref)
    g_got = loss(cfg_k)
    flat_r, _ = jax.tree.flatten(g_ref)
    flat_g, _ = jax.tree.flatten(g_got)
    for a, b in zip(flat_r, flat_g):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1e-3, np.abs(a).max())
        assert np.abs(a - b).max() / scale < 0.08
