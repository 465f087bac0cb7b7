"""Torch checkpoint converters (both directions).

``convert_state_dict``/``load_torch_checkpoint``: the reference's
``tacotron2_statedict.pt`` format (torch ``state_dict`` saved by
/root/reference/train.py:112-118) -> this framework's (params, stats)
pytrees, enabling the mel-allclose fidelity gate against the published
checkpoint (BASELINE.md config 1).

``export_state_dict``/``save_torch_checkpoint``: the exact inverse —
models trained here export to the reference's checkpoint format, so a
reference user can move in either direction (round-trip and torch-oracle
load tests in tests/test_convert.py).

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


def export_state_dict(params: Dict, stats: Dict, cfg: Tacotron2Config,
                      ) -> Dict[str, np.ndarray]:
    """(params, stats) pytrees -> reference torch state_dict (numpy values).

    Exact inverse of ``convert_state_dict`` (same key names and layouts as
    /root/reference/model.py:457-471), so a model trained here loads into
    the reference implementation with ``load_state_dict(strict=True)``
    (modulo ``num_batches_tracked``, which torch tolerates as missing only
    with strict=False — we emit it as 0 for strict loads)."""
    out: Dict[str, np.ndarray] = {}

    def dense(prefix, p, bias=True):
        out[f"{prefix}.weight"] = _t(p["kernel"]).T
        if bias:
            out[f"{prefix}.bias"] = _t(p["bias"])

    def conv(prefix, p, bias=True):
        out[f"{prefix}.weight"] = _t(p["kernel"]).transpose(2, 1, 0)
        if bias:
            out[f"{prefix}.bias"] = _t(p["bias"])

    def bn(prefix, p, s):
        out[f"{prefix}.weight"] = _t(p["scale"])
        out[f"{prefix}.bias"] = _t(p["offset"])
        out[f"{prefix}.running_mean"] = _t(s["mean"])
        out[f"{prefix}.running_var"] = _t(s["var"])
        out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    def lstm(prefix, p, suffix=""):
        out[f"{prefix}.weight_ih{suffix}"] = _t(p["wi"]).T
        out[f"{prefix}.weight_hh{suffix}"] = _t(p["wh"]).T
        out[f"{prefix}.bias_ih{suffix}"] = _t(p["bi"])
        out[f"{prefix}.bias_hh{suffix}"] = _t(p["bh"])

    out["embedding.weight"] = _t(params["embedding"])
    for i, layer in enumerate(params["encoder"]["convs"]):
        conv(f"encoder.convolutions.{i}.0.conv", layer["conv"])
        bn(f"encoder.convolutions.{i}.1", layer["bn"],
           stats["encoder"]["convs"][i])
    lstm("encoder.lstm", params["encoder"]["lstm_fwd"], "_l0")
    lstm("encoder.lstm", params["encoder"]["lstm_bwd"], "_l0_reverse")

    dp = params["decoder"]
    for i, p in enumerate(dp["prenet"]):
        dense(f"decoder.prenet.layers.{i}.linear_layer", p, bias=False)
    lstm("decoder.attention_rnn", dp["attention_rnn"])
    att = "decoder.attention_layer"
    ap = dp["attention"]
    dense(f"{att}.query_layer.linear_layer", ap["query"], bias=False)
    dense(f"{att}.memory_layer.linear_layer", ap["memory"], bias=False)
    dense(f"{att}.v.linear_layer", ap["v"], bias=False)
    conv(f"{att}.location_layer.location_conv.conv", ap["location_conv"],
         bias=False)
    dense(f"{att}.location_layer.location_dense.linear_layer",
          ap["location_dense"], bias=False)
    lstm("decoder.decoder_rnn", dp["decoder_rnn"])
    dense("decoder.linear_projection.linear_layer", dp["projection"])
    dense("decoder.gate_layer.linear_layer", dp["gate"])

    for i, layer in enumerate(params["postnet"]["convs"]):
        conv(f"postnet.convolutions.{i}.0.conv", layer["conv"])
        bn(f"postnet.convolutions.{i}.1", layer["bn"],
           stats["postnet"]["convs"][i])
    return out


def save_torch_checkpoint(path: str, params: Dict, stats: Dict,
                          cfg: Tacotron2Config, iteration: int = 0,
                          learning_rate: float = 1e-3) -> None:
    """Write a reference-format .pt checkpoint (the train.py save format,
    /root/reference/train.py:112-118, minus the optimizer state — the
    reference's resume path tolerates loading weights via --warm_start)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, stats, cfg).items()}
    torch.save({"iteration": iteration, "state_dict": sd,
                "learning_rate": learning_rate}, path)


def load_torch_checkpoint(path: str, cfg: Tacotron2Config,
                          ) -> Tuple[Dict, Dict]:
    """Load a reference .pt checkpoint file (either a bare state_dict or the
    train.py save format with a 'state_dict' key) and convert."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    return convert_state_dict(sd, cfg)
