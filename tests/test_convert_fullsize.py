"""Full-size (production-dimension) forward-parity gate vs a torch oracle.

The toy-dim converter suite (tests/test_convert.py) proves the mapping;
this module re-runs the end-to-end parity at the REFERENCE'S REAL
configuration — 512-dim embedding/encoder, 1024-dim attention/decoder
RNNs, 128-dim attention, 80 mels, 148 symbols (/root/reference/hparams.py:
47-75, model.py:457-529) — because dot-order, padding, and accumulation
issues can hide at toy widths (VERDICT r1, missing #1). This is the
published-checkpoint fidelity gate (README.md:40,76) minus the download:
the converter consumes exactly the reference state_dict format, so a run
that passes here passes with `tacotron2_statedict.pt` up to weight values.

fp32 end-to-end; mel parity <= 5e-4 atol. Marked slow (full-width decoder
steps in a torch python loop + JAX CPU compile).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.convert import convert_state_dict
from tacotron2_tpu.models import tacotron2 as m
from tests.test_convert import TorchOracle

pytestmark = pytest.mark.slow

# The reference defaults, verbatim (hparams.py:47-85), deterministic prenet
# for a comparable oracle.
CFG = Tacotron2Config(prenet_dropout_at_inference=False,
                      compute_dtype="float32")  # exact torch-oracle gate


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    oracle = TorchOracle(CFG).eval()
    for mod in oracle.modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            mod.running_mean.normal_(0, 0.3)
            mod.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, stats = convert_state_dict(sd, CFG)
    return oracle, params, stats


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    B, T_in, T_out = 2, 32, 24
    text = rng.randint(1, CFG.n_symbols, (B, T_in)).astype(np.int64)
    lengths = np.array([32, 21])
    for b, L in enumerate(lengths):
        text[b, L:] = 0
    mels = rng.randn(B, T_out, CFG.n_mel_channels).astype(np.float32) * 0.4
    return text, lengths, mels


def test_fullsize_param_count(oracle_and_params):
    """28.2M params — the real model size (SURVEY §2.2)."""
    oracle, params, stats = oracle_and_params
    import jax
    n_torch = sum(v.numel() for k, v in oracle.state_dict().items()
                  if "num_batches_tracked" not in k)
    n_ours = sum(x.size for x in jax.tree.leaves((params, stats)))
    assert n_torch == n_ours
    assert n_ours > 25_000_000


def test_fullsize_encoder_parity(oracle_and_params, inputs):
    oracle, params, stats = oracle_and_params
    text, lengths, _ = inputs
    with torch.no_grad():
        expected = oracle.encode(torch.tensor(text),
                                 torch.tensor(lengths)).numpy()
    memory, _ = m.encode(params, stats, jnp.asarray(text),
                         jnp.asarray(lengths), CFG, training=False)
    np.testing.assert_allclose(np.asarray(memory), expected, atol=1e-4)


@pytest.mark.parametrize("custom_vjp", [True, False],
                         ids=["vjp-scan", "xla-scan"])
def test_fullsize_end_to_end_mel_parity(oracle_and_params, inputs,
                                        custom_vjp):
    """The VERDICT r1 #2 'done' bar: full-size end-to-end mel parity
    <= 5e-4 atol vs torch through the converter — on both the custom-VJP
    decoder scan (the default training path) and the plain XLA scan."""
    oracle, params, stats = oracle_and_params
    text, lengths, mels = inputs
    with torch.no_grad():
        memory_t = oracle.encode(torch.tensor(text), torch.tensor(lengths))
        mel_t, gate_t, align_t = oracle.decode_teacher_forced(
            memory_t, torch.tensor(lengths), torch.tensor(mels))
        post_t = mel_t + oracle.run_postnet(mel_t)

    cfg = CFG.replace(custom_vjp_decoder=custom_vjp)
    memory, _ = m.encode(params, stats, jnp.asarray(text),
                         jnp.asarray(lengths), cfg, training=False)
    mel_j, gate_j, align_j = m.decode_teacher_forced(
        params, memory, jnp.asarray(lengths), jnp.asarray(mels), cfg,
        training=False)
    resid, _ = m.postnet_apply(params, stats, mel_j, cfg, training=False)

    np.testing.assert_allclose(np.asarray(mel_j), mel_t.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(gate_j), gate_t.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(align_j), align_t.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(mel_j + resid), post_t.numpy(),
                               atol=5e-4)
