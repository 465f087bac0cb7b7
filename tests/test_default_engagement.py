"""Default-config kernel engagement (VERDICT r3 #4): the trainer a user
gets from ``python -m tacotron2_tpu.train`` with NO hparam overrides must
route its decoder scan through the Pallas training kernels — forward AND
backward — at the real workload shapes. Round 2/3 only pinned this at the
kernel-test level; here the check is trainer-level: tracing the actual
``make_train_step`` step function (jax.eval_shape — no execution, so the
full-size config stays cheap on CPU) must reach ``forward_residuals`` and
``backward_chain``.
"""

import jax
import pytest

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.kernels import train_scan


def test_default_config_is_in_kernel_envelope():
    """The shipped defaults put every real text bucket inside the kernel
    envelope; the fp32-d_processed backward covers at least the short
    buckets at the default batch."""
    cfg = Tacotron2Config()
    assert cfg.pallas_train_scan and cfg.pallas_train_scan_bwd
    assert cfg.compute_dtype == "bfloat16"
    for t_in in cfg.text_buckets:
        assert train_scan.supported(cfg, t_in, cfg.batch_size), t_in
    assert train_scan.bwd_supported(cfg, 128, cfg.batch_size)
    # round-5 defaults: the fwd->bwd feat residual stream and the fused
    # BiLSTM encoder kernels engage at the stock config too
    assert cfg.pallas_stream_feat
    assert cfg.pallas_encoder_lstm
    from tacotron2_tpu.kernels import encoder_lstm
    assert encoder_lstm.supported(cfg, cfg.batch_size)


@pytest.mark.slow
def test_default_trainer_step_traces_through_kernels(monkeypatch):
    """Trace (not execute) the default-config train step and assert both
    Pallas scan kernels are reached. eval_shape runs the Python trace,
    so spies on the kernel entry points observe real engagement."""
    from tacotron2_tpu.parallel import create_mesh, create_sharded_state, \
        make_train_step
    from __graft_entry__ import _make_batch

    calls = {"fwd": 0, "bwd": 0, "fwd_kwargs": []}
    real_fwd = train_scan.forward_residuals
    real_bwd = train_scan.backward_chain

    def spy_fwd(*a, **kw):
        calls["fwd"] += 1
        calls["fwd_kwargs"].append(kw)
        return real_fwd(*a, **kw)

    def spy_bwd(*a, **kw):
        calls["bwd"] += 1
        return real_bwd(*a, **kw)

    monkeypatch.setattr(train_scan, "forward_residuals", spy_fwd)
    monkeypatch.setattr(train_scan, "backward_chain", spy_bwd)

    cfg = Tacotron2Config()  # SHIPPED defaults — no overrides
    B, T_in, T_out = cfg.batch_size, 128, 64
    mesh = create_mesh((1, 1))
    state = create_sharded_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_train_step(cfg, mesh, state)

    batch = _make_batch(cfg, B=B, T_in=T_in, T_out=T_out)
    jax.eval_shape(step, state, batch, jax.random.PRNGKey(1))
    assert calls["fwd"] >= 1, "default config must engage the fwd kernel"
    assert calls["bwd"] >= 1, "default config must engage the bwd kernel"
    # the fwd call must have been asked to emit the feat residual for
    # the backward (round 5): emit_feat threads through decoder_vjp.fwd
    assert any(kw.get("emit_feat") for kw in calls["fwd_kwargs"]), \
        "default config must stream the feat residual to the backward"
