"""Checkpoint converter + end-to-end model parity vs a torch oracle.

Builds a torch model with the reference's architecture and state_dict key
names (/root/reference/model.py:457-529), random weights and batchnorm
stats, exports the state_dict, converts it, and checks our JAX model
reproduces the torch forward numerics end to end (dropout disabled on both
sides; eval-mode batchnorm). This is the fidelity gate standing in for the
published checkpoint, which is not downloadable in this environment.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.convert import convert_state_dict
from tacotron2_tpu.models import tacotron2 as m

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=24, encoder_embedding_dim=24,
    encoder_n_convolutions=2, encoder_kernel_size=5, attention_rnn_dim=20,
    decoder_rnn_dim=28, prenet_dim=12, attention_dim=16,
    attention_location_n_filters=4, attention_location_kernel_size=11,
    postnet_embedding_dim=24, postnet_n_convolutions=3, n_mel_channels=10,
    max_decoder_steps=40, prenet_dropout_at_inference=False,
    compute_dtype="float32",  # torch-oracle parity (bf16 is the r3 default)
)


class TorchOracle(nn.Module):
    """Reference-architecture torch model (fresh implementation for testing;
    key names follow model.py so the converter sees the real format)."""

    def __init__(self, cfg):
        super().__init__()
        e, a, d = (cfg.encoder_embedding_dim, cfg.attention_rnn_dim,
                   cfg.decoder_rnn_dim)
        nm = cfg.n_mel_channels
        self.cfg = cfg
        self.embedding = nn.Embedding(cfg.n_symbols, cfg.symbols_embedding_dim)

        class _Seq(nn.Module):
            def __init__(self, conv, bn):
                super().__init__()
                # submodule indices "0"/"1" and inner name "conv" to match
                # ConvNorm nesting (layers.py:21-39, model.py:159-166)
                self.add_module("0", _ConvHolder(conv))
                self.add_module("1", bn)

        class _ConvHolder(nn.Module):
            def __init__(self, conv):
                super().__init__()
                self.conv = conv

        class _LinHolder(nn.Module):
            def __init__(self, lin):
                super().__init__()
                self.linear_layer = lin

        self._Seq, self._ConvHolder, self._LinHolder = _Seq, _ConvHolder, _LinHolder

        enc = []
        for _ in range(cfg.encoder_n_convolutions):
            enc.append(_Seq(nn.Conv1d(e, e, cfg.encoder_kernel_size,
                                      padding=(cfg.encoder_kernel_size - 1) // 2),
                            nn.BatchNorm1d(e)))
        self.encoder = nn.Module()
        self.encoder.convolutions = nn.ModuleList(enc)
        self.encoder.lstm = nn.LSTM(e, e // 2, 1, batch_first=True,
                                    bidirectional=True)

        dec = nn.Module()
        dec.prenet = nn.Module()
        dec.prenet.layers = nn.ModuleList([
            _LinHolder(nn.Linear(nm, cfg.prenet_dim, bias=False)),
            _LinHolder(nn.Linear(cfg.prenet_dim, cfg.prenet_dim, bias=False)),
        ])
        dec.attention_rnn = nn.LSTMCell(cfg.prenet_dim + e, a)
        att = nn.Module()
        att.query_layer = _LinHolder(nn.Linear(a, cfg.attention_dim, bias=False))
        att.memory_layer = _LinHolder(nn.Linear(e, cfg.attention_dim, bias=False))
        att.v = _LinHolder(nn.Linear(cfg.attention_dim, 1, bias=False))
        att.location_layer = nn.Module()
        att.location_layer.location_conv = _ConvHolder(
            nn.Conv1d(2, cfg.attention_location_n_filters,
                      cfg.attention_location_kernel_size,
                      padding=(cfg.attention_location_kernel_size - 1) // 2,
                      bias=False))
        att.location_layer.location_dense = _LinHolder(
            nn.Linear(cfg.attention_location_n_filters, cfg.attention_dim,
                      bias=False))
        dec.attention_layer = att
        dec.decoder_rnn = nn.LSTMCell(a + e, d)
        dec.linear_projection = _LinHolder(nn.Linear(d + e, nm))
        dec.gate_layer = _LinHolder(nn.Linear(d + e, 1))
        self.decoder = dec

        post = []
        post.append(_Seq(nn.Conv1d(nm, cfg.postnet_embedding_dim,
                                   cfg.postnet_kernel_size, padding=2),
                         nn.BatchNorm1d(cfg.postnet_embedding_dim)))
        for _ in range(cfg.postnet_n_convolutions - 2):
            post.append(_Seq(nn.Conv1d(cfg.postnet_embedding_dim,
                                       cfg.postnet_embedding_dim,
                                       cfg.postnet_kernel_size, padding=2),
                             nn.BatchNorm1d(cfg.postnet_embedding_dim)))
        post.append(_Seq(nn.Conv1d(cfg.postnet_embedding_dim, nm,
                                   cfg.postnet_kernel_size, padding=2),
                         nn.BatchNorm1d(nm)))
        self.postnet = nn.Module()
        self.postnet.convolutions = nn.ModuleList(post)

    # --- forward pieces (dropout-free, eval BN) ---

    def encode(self, text, lengths):
        x = self.embedding(text).transpose(1, 2)
        for seq in self.encoder.convolutions:
            x = F.relu(getattr(seq, "1")(getattr(seq, "0").conv(x)))
        x = x.transpose(1, 2)
        packed = nn.utils.rnn.pack_padded_sequence(
            x, lengths, batch_first=True, enforce_sorted=False)
        out, _ = self.encoder.lstm(packed)
        out, _ = nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
        return out

    def prenet(self, x):
        for holder in self.decoder.prenet.layers:
            x = F.relu(holder.linear_layer(x))
        return x

    def attend(self, att_h, memory, pmem, w, w_cum, mask):
        att = self.decoder.attention_layer
        cat = torch.stack([w, w_cum], dim=1)  # (B, 2, T)
        loc = att.location_layer.location_conv.conv(cat).transpose(1, 2)
        loc = att.location_layer.location_dense.linear_layer(loc)
        q = att.query_layer.linear_layer(att_h).unsqueeze(1)
        energies = att.v.linear_layer(torch.tanh(q + loc + pmem)).squeeze(-1)
        energies = energies.masked_fill(~mask, -float("inf"))
        weights = torch.softmax(energies, dim=1)
        context = torch.bmm(weights.unsqueeze(1), memory).squeeze(1)
        return context, weights

    def decode_teacher_forced(self, memory, lengths, mels):
        dec = self.decoder
        B, T_in, e = memory.shape
        T_out = mels.shape[1]
        mask = (torch.arange(T_in)[None, :] < lengths[:, None])
        pmem = dec.attention_layer.memory_layer.linear_layer(memory)
        att_h = memory.new_zeros(B, self.cfg.attention_rnn_dim)
        att_c = torch.zeros_like(att_h)
        dec_h = memory.new_zeros(B, self.cfg.decoder_rnn_dim)
        dec_c = torch.zeros_like(dec_h)
        w = memory.new_zeros(B, T_in)
        w_cum = torch.zeros_like(w)
        context = memory.new_zeros(B, e)
        go = mels.new_zeros(B, 1, mels.shape[2])
        inputs = self.prenet(torch.cat([go, mels[:, :-1]], dim=1))
        outs, gates, aligns = [], [], []
        for t in range(T_out):
            cell_in = torch.cat([inputs[:, t], context], dim=-1)
            att_h, att_c = dec.attention_rnn(cell_in, (att_h, att_c))
            context, w = self.attend(att_h, memory, pmem, w, w_cum, mask)
            w_cum = w_cum + w
            d_in = torch.cat([att_h, context], dim=-1)
            dec_h, dec_c = dec.decoder_rnn(d_in, (dec_h, dec_c))
            proj_in = torch.cat([dec_h, context], dim=-1)
            outs.append(dec.linear_projection.linear_layer(proj_in))
            gates.append(dec.gate_layer.linear_layer(proj_in).squeeze(-1))
            aligns.append(w)
        return (torch.stack(outs, 1), torch.stack(gates, 1),
                torch.stack(aligns, 1))

    def run_postnet(self, mels):
        x = mels.transpose(1, 2)
        n = len(self.postnet.convolutions)
        for i, seq in enumerate(self.postnet.convolutions):
            x = getattr(seq, "1")(getattr(seq, "0").conv(x))
            if i < n - 1:
                x = torch.tanh(x)
        return x.transpose(1, 2)


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    oracle = TorchOracle(CFG).eval()
    # randomize batchnorm stats so conversion of stats is actually exercised
    for mod in oracle.modules():
        if isinstance(mod, nn.BatchNorm1d):
            mod.running_mean.normal_(0, 0.3)
            mod.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, stats = convert_state_dict(sd, CFG)
    return oracle, params, stats


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    B, T_in, T_out = 3, 11, 14
    text = rng.randint(1, 148, (B, T_in)).astype(np.int64)
    lengths = np.array([11, 8, 5])
    for b, L in enumerate(lengths):
        text[b, L:] = 0
    mels = rng.randn(B, T_out, CFG.n_mel_channels).astype(np.float32) * 0.4
    return text, lengths, mels


class TestExport:
    def test_roundtrip_exact(self, oracle_and_params):
        """export_state_dict is the exact inverse of convert_state_dict."""
        from tacotron2_tpu.convert import export_state_dict
        oracle, params, stats = oracle_and_params
        sd = export_state_dict(params, stats, CFG)
        params2, stats2 = convert_state_dict(sd, CFG)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), (params, stats),
            (params2, stats2))

    def test_torch_oracle_loads_export_strict(self, oracle_and_params,
                                              inputs):
        """A reference-architecture torch model loads the exported
        state_dict with strict=True and produces identical outputs —
        the 'switch back to the reference' interop path."""
        from tacotron2_tpu.convert import export_state_dict
        oracle, params, stats = oracle_and_params
        sd = export_state_dict(params, stats, CFG)
        fresh = TorchOracle(CFG).eval()
        fresh.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}, strict=True)
        text, lengths, _ = inputs
        with torch.no_grad():
            a = oracle.encode(torch.tensor(text), torch.tensor(lengths))
            b = fresh.encode(torch.tensor(text), torch.tensor(lengths))
        np.testing.assert_array_equal(a.numpy(), b.numpy())

    def test_save_torch_checkpoint_roundtrip(self, oracle_and_params,
                                             tmp_path):
        from tacotron2_tpu.convert import (
            load_torch_checkpoint, save_torch_checkpoint,
        )
        oracle, params, stats = oracle_and_params
        path = str(tmp_path / "export.pt")
        save_torch_checkpoint(path, params, stats, CFG, iteration=7)
        params2, stats2 = load_torch_checkpoint(path, CFG)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), (params, stats),
            (params2, stats2))


class TestConverterParity:
    def test_state_dict_fully_consumed(self, oracle_and_params):
        oracle, params, stats = oracle_and_params
        n_torch = sum(v.numel() for k, v in oracle.state_dict().items()
                      if "num_batches_tracked" not in k)
        n_ours = sum(x.size for x in jax.tree.leaves((params, stats)))
        assert n_torch == n_ours

    def test_encoder_parity(self, oracle_and_params, inputs):
        oracle, params, stats = oracle_and_params
        text, lengths, _ = inputs
        with torch.no_grad():
            expected = oracle.encode(torch.tensor(text),
                                     torch.tensor(lengths)).numpy()
        memory, _ = m.encode(params, stats, jnp.asarray(text),
                             jnp.asarray(lengths), CFG, training=False)
        np.testing.assert_allclose(np.asarray(memory), expected, atol=1e-5)

    def test_teacher_forced_parity(self, oracle_and_params, inputs):
        """Full forward: embedding -> encoder -> decoder -> postnet."""
        oracle, params, stats = oracle_and_params
        text, lengths, mels = inputs
        with torch.no_grad():
            memory_t = oracle.encode(torch.tensor(text), torch.tensor(lengths))
            mel_t, gate_t, align_t = oracle.decode_teacher_forced(
                memory_t, torch.tensor(lengths), torch.tensor(mels))
            post_t = mel_t + oracle.run_postnet(mel_t)

        memory, _ = m.encode(params, stats, jnp.asarray(text),
                             jnp.asarray(lengths), CFG, training=False)
        mel_j, gate_j, align_j = m.decode_teacher_forced(
            params, memory, jnp.asarray(lengths), jnp.asarray(mels), CFG,
            training=False)
        resid, _ = m.postnet_apply(params, stats, mel_j, CFG, training=False)

        np.testing.assert_allclose(np.asarray(mel_j), mel_t.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gate_j), gate_t.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(align_j), align_t.numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(mel_j + resid), post_t.numpy(),
                                   atol=5e-4)

    def test_autoregressive_inference_parity(self, oracle_and_params, inputs):
        """AR inference (deterministic prenet): feed own outputs; compare a
        torch loop driven the same way for a fixed number of steps."""
        oracle, params, stats = oracle_and_params
        text, lengths, _ = inputs
        steps = 6
        with torch.no_grad():
            memory_t = oracle.encode(torch.tensor(text), torch.tensor(lengths))
            dec = oracle.decoder
            B, T_in, e = memory_t.shape
            mask = (torch.arange(T_in)[None, :] < torch.tensor(lengths)[:, None])
            pmem = dec.attention_layer.memory_layer.linear_layer(memory_t)
            att_h = memory_t.new_zeros(B, CFG.attention_rnn_dim)
            att_c = torch.zeros_like(att_h)
            dec_h = memory_t.new_zeros(B, CFG.decoder_rnn_dim)
            dec_c = torch.zeros_like(dec_h)
            w = memory_t.new_zeros(B, T_in)
            w_cum = torch.zeros_like(w)
            context = memory_t.new_zeros(B, e)
            prev = memory_t.new_zeros(B, CFG.n_mel_channels)
            frames = []
            for t in range(steps):
                pre = oracle.prenet(prev)
                cell_in = torch.cat([pre, context], dim=-1)
                att_h, att_c = dec.attention_rnn(cell_in, (att_h, att_c))
                context, w = oracle.attend(att_h, memory_t, pmem, w, w_cum, mask)
                w_cum = w_cum + w
                d_in = torch.cat([att_h, context], dim=-1)
                dec_h, dec_c = dec.decoder_rnn(d_in, (dec_h, dec_c))
                proj_in = torch.cat([dec_h, context], dim=-1)
                prev = dec.linear_projection.linear_layer(proj_in)
                frames.append(prev)
            expected = torch.stack(frames, 1).numpy()

        memory, _ = m.encode(params, stats, jnp.asarray(text),
                             jnp.asarray(lengths), CFG, training=False)
        mel, _, _, mel_lengths = m.decode_autoregressive(
            params, memory, jnp.asarray(lengths), CFG, max_steps=steps)
        got = np.asarray(mel[:, :steps])
        # rows gate-stop independently with random weights — compare each
        # row up to its own produced length
        compared = 0
        for b in range(got.shape[0]):
            L = min(int(mel_lengths[b]), steps)
            np.testing.assert_allclose(got[b, :L], expected[b, :L], atol=2e-4)
            compared += L
        assert compared >= 3  # the comparison must not be vacuous
