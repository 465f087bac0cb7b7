"""Torch checkpoint converter.

One-way converter from the reference's ``tacotron2_statedict.pt`` format
(torch ``state_dict`` saved by /root/reference/train.py:112-118) to this
framework's (params, stats) pytrees, enabling the mel-allclose fidelity
gate against the published checkpoint (BASELINE.md config 1).

Layout differences handled here:
- torch Linear weight (out, in)  -> dense kernel (in, out)        [transpose]
- torch Conv1d weight (out, in, k) -> conv kernel (k, in, out)    [transpose]
- torch LSTM stacked gates (4H, in) -> wi (in, 4H)                [transpose]
  (gate block order i,f,g,o is identical, so no reordering)
- BatchNorm weight/bias -> scale/offset; running stats go to the separate
  ``stats`` tree.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from tacotron2_tpu.config import Tacotron2Config


def _t(x) -> np.ndarray:  # torch tensor -> numpy, no torch import needed here
    return np.asarray(x, dtype=np.float32)


def _dense(sd: Dict, prefix: str, bias: bool = True) -> Dict:
    p = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if bias:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _conv(sd: Dict, prefix: str, bias: bool = True) -> Dict:
    p = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if bias:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _t(sd[f"{prefix}.weight"]),
              "offset": _t(sd[f"{prefix}.bias"])}
    stats = {"mean": _t(sd[f"{prefix}.running_mean"]),
             "var": _t(sd[f"{prefix}.running_var"])}
    return params, stats


def _lstm(sd: Dict, prefix: str, suffix: str = "") -> Dict:
    return {"wi": _t(sd[f"{prefix}.weight_ih{suffix}"]).T,
            "wh": _t(sd[f"{prefix}.weight_hh{suffix}"]).T,
            "bi": _t(sd[f"{prefix}.bias_ih{suffix}"]),
            "bh": _t(sd[f"{prefix}.bias_hh{suffix}"])}


def convert_state_dict(sd: Dict, cfg: Tacotron2Config) -> Tuple[Dict, Dict]:
    """Reference torch state_dict -> (params, stats) pytrees.

    Key names follow the reference module tree (model.py:457-471):
    embedding, encoder.convolutions.N.{0=conv,1=bn}, encoder.lstm,
    decoder.{prenet,attention_rnn,attention_layer,decoder_rnn,
    linear_projection,gate_layer}, postnet.convolutions.N.{0,1}.
    """
    # strip DataParallel-style 'module.' prefixes if present
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    enc_convs, enc_bn_stats = [], []
    for i in range(cfg.encoder_n_convolutions):
        bn_p, bn_s = _bn(sd, f"encoder.convolutions.{i}.1")
        enc_convs.append({"conv": _conv(sd, f"encoder.convolutions.{i}.0.conv"),
                          "bn": bn_p})
        enc_bn_stats.append(bn_s)

    post_convs, post_bn_stats = [], []
    for i in range(cfg.postnet_n_convolutions):
        bn_p, bn_s = _bn(sd, f"postnet.convolutions.{i}.1")
        post_convs.append({"conv": _conv(sd, f"postnet.convolutions.{i}.0.conv"),
                           "bn": bn_p})
        post_bn_stats.append(bn_s)

    att = "decoder.attention_layer"
    params = {
        "embedding": _t(sd["embedding.weight"]),
        "encoder": {
            "convs": enc_convs,
            "lstm_fwd": _lstm(sd, "encoder.lstm", "_l0"),
            "lstm_bwd": _lstm(sd, "encoder.lstm", "_l0_reverse"),
        },
        "decoder": {
            "prenet": [
                _dense(sd, "decoder.prenet.layers.0.linear_layer", bias=False),
                _dense(sd, "decoder.prenet.layers.1.linear_layer", bias=False),
            ],
            "attention_rnn": _lstm(sd, "decoder.attention_rnn"),
            "attention": {
                "query": _dense(sd, f"{att}.query_layer.linear_layer",
                                bias=False),
                "memory": _dense(sd, f"{att}.memory_layer.linear_layer",
                                 bias=False),
                "v": _dense(sd, f"{att}.v.linear_layer", bias=False),
                "location_conv": _conv(
                    sd, f"{att}.location_layer.location_conv.conv",
                    bias=False),
                "location_dense": _dense(
                    sd, f"{att}.location_layer.location_dense.linear_layer",
                    bias=False),
            },
            "decoder_rnn": _lstm(sd, "decoder.decoder_rnn"),
            "projection": _dense(sd, "decoder.linear_projection.linear_layer"),
            "gate": _dense(sd, "decoder.gate_layer.linear_layer"),
        },
        "postnet": {"convs": post_convs},
    }
    stats = {"encoder": {"convs": enc_bn_stats},
             "postnet": {"convs": post_bn_stats}}
    return params, stats


def load_torch_checkpoint(path: str, cfg: Tacotron2Config,
                          ) -> Tuple[Dict, Dict]:
    """Load a reference .pt checkpoint file (either a bare state_dict or the
    train.py save format with a 'state_dict' key) and convert."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    return convert_state_dict(sd, cfg)
