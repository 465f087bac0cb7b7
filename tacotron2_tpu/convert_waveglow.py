"""WaveGlow torch checkpoint converter.

Maps the published ``waveglow_256channels.pt`` format (the torch WaveGlow
of arXiv:1811.00002, consumed by the reference notebook) onto our flow
vocoder's pytree (models/waveglow.py). Differences handled:

- weight normalization on WN convs: torch stores ``weight_g``/``weight_v``;
  we materialize w = g * v / ||v|| (norm over (in, k) per out-channel);
- the torch WN has ONE fused cond conv per flow producing
  ``2 * n_channels * n_layers`` channels, sliced per layer here;
- torch conv weights (out, in, k) -> ours (k, in, out);
- the invertible 1x1 stores a conv weight (c, c, 1) -> (c, c) matrix; note
  torch applies it as a conv (y = W x over the channel dim) while we apply
  ``x @ w`` — hence the transpose.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from tacotron2_tpu.models.waveglow import WaveGlowConfig, _remaining_channels


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv_weight(sd: Dict, prefix: str) -> np.ndarray:
    """(out, in, k) plain or weight-normed conv weight."""
    if f"{prefix}.weight" in sd:
        w = _t(sd[f"{prefix}.weight"])
    else:
        g = _t(sd[f"{prefix}.weight_g"])  # (out, 1, 1)
        v = _t(sd[f"{prefix}.weight_v"])  # (out, in, k)
        norm = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    return w


def _conv(sd: Dict, prefix: str) -> Dict:
    w = _conv_weight(sd, prefix)
    return {"kernel": w.transpose(2, 1, 0),
            "bias": _t(sd[f"{prefix}.bias"])}


def convert_waveglow_state_dict(sd: Dict, cfg: WaveGlowConfig
                                ) -> Tuple[Dict, WaveGlowConfig]:
    """torch WaveGlow state_dict -> our params pytree."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    params: Dict = {"upsample": {
        # ConvTranspose1d weight (in, out, k) -> (k, in, out), SPATIALLY
        # FLIPPED: torch's transposed conv is the adjoint of a correlation,
        # lax.conv_transpose is a fractionally-strided correlation
        "kernel": np.ascontiguousarray(
            _t(sd["upsample.weight"]).transpose(2, 0, 1)[::-1]),
        "bias": _t(sd["upsample.bias"]),
    }}

    flows = []
    for i in range(cfg.n_flows):
        c = _remaining_channels(cfg, i)
        # torch: convinv.k.conv.weight (c, c, 1); applied channels-first as
        # y = W @ x; ours is x_row @ w -> transpose
        w = _t(sd[f"convinv.{i}.conv.weight"])[:, :, 0].T
        assert w.shape == (c, c), (i, w.shape)

        wn_prefix = f"WN.{i}"
        start = _conv(sd, f"{wn_prefix}.start")
        end = _conv(sd, f"{wn_prefix}.end")
        fused_cond = (f"{wn_prefix}.cond_layer.bias" in sd
                      or f"{wn_prefix}.cond_layer.weight_g" in sd)
        if fused_cond:
            cond_w = _conv_weight(sd, f"{wn_prefix}.cond_layer")
            cond_b = _t(sd[f"{wn_prefix}.cond_layer.bias"])
        layers = []
        for j in range(cfg.wn_layers):
            if fused_cond:
                lo, hi = 2 * cfg.wn_channels * j, 2 * cfg.wn_channels * (j + 1)
                cond_conv = {"kernel": cond_w[lo:hi].transpose(2, 1, 0),
                             "bias": cond_b[lo:hi]}
            else:  # pre-2019 checkpoints: per-layer cond convs
                cond_conv = _conv(sd, f"{wn_prefix}.cond_layers.{j}")
            layers.append({
                "in_conv": _conv(sd, f"{wn_prefix}.in_layers.{j}"),
                "cond_conv": cond_conv,
                "res_skip": _conv(sd, f"{wn_prefix}.res_skip_layers.{j}"),
            })
        flows.append({"inv1x1": {"w": w},
                      "wn": {"start": start, "layers": layers, "end": end}})
    params["flows"] = flows
    return params, cfg


def load_waveglow_checkpoint(path: str, cfg: WaveGlowConfig = WaveGlowConfig()
                             ) -> Tuple[Dict, WaveGlowConfig]:
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    model = blob.get("model", blob) if isinstance(blob, dict) else blob
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    sd = {k: (v.detach().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    return convert_waveglow_state_dict(sd, cfg)
