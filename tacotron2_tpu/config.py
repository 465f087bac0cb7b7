"""Experiment configuration.

Replaces the reference's TF-1.15 ``tf.contrib.training.HParams`` singleton
(/root/reference/hparams.py:5-95) with a frozen dataclass: same flat parameter
namespace, same defaults, same ``"key=value,key=value"`` override string — but
no TensorFlow dependency, and with extra TPU-first knobs (mesh shape, compute
dtype, length bucketing) that have no reference equivalent.
"""

from __future__ import annotations

import dataclasses
import re
import typing
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class Tacotron2Config:
    # ---- Experiment (reference hparams.py:12-22) ----
    epochs: int = 500
    iters_per_checkpoint: int = 1000
    seed: int = 1234
    ignore_layers: List[str] = field(default_factory=lambda: ["embedding"])

    # ---- Data (reference hparams.py:27-31) ----
    load_mel_from_disk: bool = False
    training_files: str = "filelists/ljs_audio_text_train_filelist.txt"
    validation_files: str = "filelists/ljs_audio_text_val_filelist.txt"
    text_cleaners: List[str] = field(default_factory=lambda: ["english_cleaners"])
    # Mixed grapheme/phoneme training: probability of swapping each word
    # for its {ARPAbet} pronunciation (requires cmudict_path). The
    # reference ships the CMUDict loader but never wires it into training
    # (text/cmudict.py, SURVEY §2.1 #17); this is the standard recipe the
    # reference family uses for phoneme-aware finetunes.
    p_arpabet: float = 0.0
    cmudict_path: Optional[str] = None

    # ---- Audio (reference hparams.py:35-42) ----
    max_wav_value: float = 32768.0
    sampling_rate: int = 22050
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0

    # ---- Model (reference hparams.py:47-75) ----
    n_symbols: int = 148  # len(text.symbols); checked at model init
    symbols_embedding_dim: int = 512

    encoder_kernel_size: int = 5
    encoder_n_convolutions: int = 3
    encoder_embedding_dim: int = 512

    n_frames_per_step: int = 1
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    max_decoder_steps: int = 1000
    gate_threshold: float = 0.5
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1

    attention_rnn_dim: int = 1024
    attention_dim: int = 128

    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31

    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5

    # ---- Optimization (reference hparams.py:80-85) ----
    use_saved_learning_rate: bool = False
    learning_rate: float = 1e-3
    weight_decay: float = 1e-6
    grad_clip_thresh: float = 1.0
    batch_size: int = 64
    mask_padding: bool = True

    # ---- TPU-native additions (no reference equivalent) ----
    # Metric host-sync cadence: the trainer pulls loss/grad-norm to the
    # host every log_interval steps (and at every checkpoint boundary).
    # The reference syncs every step (train.py:219 loss.item()), which
    # stalls the device behind the host; at a cadence the prefetcher and
    # async dispatch run ahead. 1 = reference-style per-step logging.
    log_interval: int = 10
    # Compute dtype for matmuls/convs; params and optimizer state stay fp32.
    # Replaces the reference's Apex AMP fp16 path (train.py:173-176) — bf16
    # on TPU needs no loss scaling. Round 3: bfloat16 is the DEFAULT (the
    # benchmarked configuration is the shipped one — VERDICT r2 #4); set
    # "float32" for full-precision runs, e.g. exact torch-oracle parity.
    compute_dtype: str = "bfloat16"  # "float32" | "bfloat16"
    # Device mesh: (data-parallel, model-parallel). mp=1 disables TP.
    mesh_shape: Tuple[int, int] = (1, 1)
    # Static-shape length buckets replacing the reference's dynamic
    # sort-and-pad collate (data_utils.py:73-96). Text lengths are padded up
    # to the nearest bucket; mel lengths to the nearest multiple of
    # mel_bucket_step. Bounded compile count, no recompilation churn.
    text_buckets: Tuple[int, ...] = (64, 128, 192)
    mel_bucket_step: int = 128
    max_mel_length: int = 1024
    # Prenet dropout is active even at inference in the reference
    # (model.py:99); keep that as the default but allow turning it off.
    prenet_dropout_at_inference: bool = True
    # The reference's validation also runs with prenet dropout active
    # (model.py:99 + train.py:121-146). True (default) reproduces that —
    # needed for val-loss parity against a reference run; False runs the
    # eval prenet deterministically for a noise-free validation signal.
    eval_prenet_dropout: bool = True
    # Decoder scan unrolling: amortizes per-step loop overhead on TPU at
    # the cost of compile time. Applies to the XLA scan paths (the Pallas
    # training kernels run the whole scan as one grid). 8 was optimal in
    # the round-1 sweep under the custom-VJP backward (PERFORMANCE.md)
    # and is the default since round 4 — the default config IS the fast
    # path (the remaining bench.py deltas, batch_size=128 and
    # prng_impl=unsafe_rbg, change semantics — batch recipe /
    # reproducible dropout streams — so they stay opt-in; README
    # documents the gap).
    decoder_scan_unroll: int = 8
    # Rematerialize the decoder step in the backward pass (trade FLOPs for
    # HBM when training long sequences / large batches).
    remat_decoder: bool = False
    # Hand-written VJP for the teacher-forced decoder scan
    # (models/decoder_vjp.py): the backward scan computes only the
    # sequential data-gradient chain and stacks per-step gate cotangents;
    # LSTM weight gradients become single large matmuls (contraction T*B)
    # hoisted off the critical path — the cuDNN-RNN-style backward.
    # +27% train throughput on TPU v5e (PERFORMANCE.md); gradient parity
    # vs plain autodiff is pinned by tests/test_decoder_vjp.py. Set False
    # to fall back to the XLA-autodiff scan.
    custom_vjp_decoder: bool = True
    # Interleave the teacher-forced decoder scan over N independent
    # sub-batch chains per scan step (custom-VJP path only). Each step
    # computes step t of all N chains; their dependency chains are
    # independent, so XLA can overlap one chain's elementwise/VPU phase
    # with another's MXU matmuls — the per-step critical path of a single
    # chain leaves the MXU idle during the LSTM activations and attention
    # softmax (PERFORMANCE.md). Dropout masks are drawn at full batch
    # width and sliced per chain, and a (B,K)@(K,N) matmul split into
    # row chunks is bitwise-identical per row, so any N gives EXACTLY the
    # same numbers as N=1. batch_size must be divisible by N. 1 = off.
    decoder_interleave: int = 1
    # Run the teacher-forced decoder forward scan as ONE Pallas kernel
    # with every decoder weight VMEM-resident across all steps
    # (kernels/train_scan.py) — eliminates the ~36 MB/step weight
    # re-stream that bounds the XLA scan. Drops in as the forward of the
    # custom-VJP path (it emits the same residual stacks the hand-written
    # backward consumes); requires custom_vjp_decoder=True, bfloat16
    # compute, decoder_interleave=1, all of (prenet_dim,
    # encoder_embedding_dim, attention_rnn_dim, decoder_rnn_dim,
    # attention_dim) multiples of 128, T_in <= 256 (<= 192 when the
    # batch tile exceeds 64 rows), and trace-time batch <= 512 (a
    # multiple of 128 above 128: uniform batch tiles over the grid).
    # The envelope is judged on the TRACE-TIME batch — the shape the
    # kernel is built with (the global batch under the GSPMD-jitted
    # step); configurations outside it fall back to the XLA forward
    # scan with a one-time warning (kernels/train_scan.supported).
    # Round 3: ON by default, QUALITY-GATE VALIDATED — the tone-corpus
    # gate (tools/synthesis_check.py) passes 11/11 through the full
    # fwd+bwd kernel path (after the d_processed fp32 fix, see
    # pallas_train_scan_bwd below). Validated single-chip and under the
    # dp-sharded pjit step on a virtual mesh (interpret lowering); on a
    # real multi-chip pod the Mosaic-call GSPMD partitioning is
    # unvalidated — if the pod compile rejects it, set this flag False.
    pallas_train_scan: bool = True
    # With pallas_train_scan: also run the BACKWARD data-gradient chain
    # as a weights-resident reverse-grid Pallas kernel
    # (kernels/train_scan.py:backward_chain); parameter gradients hoist
    # outside from its emitted cotangent stacks. Round-3 history: the
    # end-to-end tone-corpus gate caught a training-quality drift in
    # this kernel (late gate, 8/11 tones over 5k/10k-step runs) that
    # per-step gradient parity could not see; a bisect isolated it and
    # the root cause was d_processed being recovered by summing the
    # bf16-rounded d_M stack. With fp32 in-kernel d_processed
    # accumulation restored, the full fwd+bwd kernel path passes the
    # gate exactly like the XLA path (11/11 tones, 76-frame gate —
    # BENCH_DETAILS.json round3_kernel_training_quality). The kernel is
    # therefore ON by default but quality-gated: it engages only where
    # the fp32 accumulator fits (per-tile rows x t_pad <= 128x128,
    # kernels/train_scan.bwd_supported); other shapes take the XLA
    # custom-VJP backward.
    pallas_train_scan_bwd: bool = True
    # With both training-scan kernels engaged: the forward kernel emits
    # its post-tanh attention energies tensor (feat, bf16) as an extra
    # residual stream and the backward consumes it instead of
    # rematerializing cat@band + tanh — the remat was 11.0 ms of the
    # 44.2 ms backward and its q = atth@wq feeder matmul dies with it
    # (round-5 section ablation, BENCH_DETAILS round5_section_ablation).
    # Costs one (B, T_pad*attention_dim) bf16 stream out of the forward.
    # feat is bf16-rounded where the remat was fp32 — quality-gated like
    # every backward-numerics change (tone-corpus gate).
    pallas_stream_feat: bool = True
    # Weights-resident fused BiLSTM encoder scans (fwd + reverse-grid
    # backward, kernels/encoder_lstm.py): the lax.scan encoder is
    # dispatch-overhead-bound (~8% MFU, ~8 ms fwd+bwd at B=128 —
    # round-5 decomposition). Envelope: bf16, dims %128, batch %8 and
    # <= 128; other shapes (incl. B=1 inference) take the XLA scan.
    pallas_encoder_lstm: bool = True
    # Force Pallas interpret lowering for the training-scan kernels.
    # None = auto (interpret off-TPU). Needed when the process default
    # backend is a TPU but the computation targets a CPU mesh (the
    # virtual-device multichip dryrun under the forced-axon runtime):
    # auto-detection sees "tpu" and would emit a native Mosaic call
    # that the CPU backend rejects.
    pallas_interpret: Optional[bool] = None
    # Checkpoint policy name (jax.checkpoint_policies.*) for the decoder
    # scan step, e.g. "dots_saveable": save only matmul outputs, recompute
    # elementwise ops in the backward — less residual HBM traffic than
    # full autodiff saving, less recompute than remat_decoder. None = save
    # everything (plain autodiff). Ignored when remat_decoder=True.
    decoder_remat_policy: Optional[str] = None
    # Rematerialize the attention-energy computation in the decoder scan's
    # backward pass. Its (B, T_in, att_dim) tanh residuals are the largest
    # per-step activations (~8 MB/step at B=128) — recomputing a few small
    # matmuls beats streaming them through HBM. Measured per-hardware.
    remat_attention_energies: bool = False
    # Split the decoder scan's transpose (backward) into a separate scan
    # (jax.lax.scan _split_transpose): lets XLA schedule the residual
    # re-reads and weight-gradient accumulation independently of the
    # sequential data-gradient chain. Measured per-hardware; off by default.
    decoder_scan_split_transpose: bool = False
    # Debug mode: raise on the first NaN produced anywhere under jit
    # (jax.config.jax_debug_nans) — the functional-model analog of the
    # reference's overflow diagnostics. Slows execution; off by default.
    debug_nans: bool = False
    # Gradient accumulation: micro-batches per optimizer step (1 = off).
    # Effective batch = batch_size; activation memory = one micro-batch
    # (training/accumulate.py).
    grad_accum_steps: int = 1
    # PRNG implementation for dropout keys. "unsafe_rbg" uses the TPU
    # hardware RNG path: +16% train throughput measured (PERFORMANCE.md),
    # at the cost of counter-based key stability across jax versions.
    # "threefry" (default) keeps fully reproducible streams.
    prng_impl: str = "threefry"  # "threefry" | "rbg" | "unsafe_rbg"

    def replace(self, **kw) -> "Tacotron2Config":
        return dataclasses.replace(self, **kw)

    @property
    def jax_compute_dtype(self):
        """None (full fp32) or a jnp dtype for mixed-precision matmuls."""
        if self.compute_dtype == "float32":
            return None
        import jax.numpy as jnp
        return {"bfloat16": jnp.bfloat16}[self.compute_dtype]

    def validate(self) -> "Tacotron2Config":
        """Check cross-field invariants; returns self for chaining.

        Called by the Trainer at startup so misconfigurations fail with a
        message instead of a shape error deep inside a jit trace.
        """
        errors = []
        if self.encoder_kernel_size % 2 == 0:
            errors.append("encoder_kernel_size must be odd (SAME padding)")
        if self.attention_location_kernel_size % 2 == 0:
            errors.append("attention_location_kernel_size must be odd")
        if self.postnet_kernel_size % 2 == 0:
            errors.append("postnet_kernel_size must be odd")
        if self.encoder_embedding_dim % 2:
            errors.append("encoder_embedding_dim must be even (BiLSTM halves)")
        if self.win_length > self.filter_length:
            errors.append("win_length must be <= filter_length")
        if self.n_frames_per_step < 1:
            errors.append("n_frames_per_step must be >= 1")
        if self.max_mel_length % self.mel_bucket_step:
            errors.append("max_mel_length must be a multiple of "
                          "mel_bucket_step")
        if self.compute_dtype not in ("float32", "bfloat16"):
            errors.append(f"unknown compute_dtype {self.compute_dtype!r}")
        if self.prng_impl not in ("threefry", "rbg", "unsafe_rbg"):
            errors.append(f"unknown prng_impl {self.prng_impl!r}")
        if not 0.0 <= self.p_arpabet <= 1.0:
            errors.append("p_arpabet must be in [0, 1]")
        if self.p_arpabet > 0.0 and not self.cmudict_path:
            errors.append("p_arpabet > 0 requires cmudict_path")
        if errors:
            raise ValueError("invalid config: " + "; ".join(errors))
        return self


_LIST_SPLIT = re.compile(r"[;+]")


def _coerce(value: str, ftype):
    """Coerce a string override to the declared field type."""
    origin = typing.get_origin(ftype)
    if origin in (list, tuple):
        (etype,) = set(typing.get_args(ftype)) - {Ellipsis}
        items = [v for v in _LIST_SPLIT.split(value) if v]
        seq = [_coerce(v, etype) for v in items]
        return tuple(seq) if origin is tuple else seq
    if ftype is bool or ftype == Optional[bool]:
        low = value.strip().lower()
        if low in ("true", "1", "yes"):
            return True
        if low in ("false", "0", "no"):
            return False
        raise ValueError(f"cannot parse boolean from {value!r}")
    if ftype is int:
        return int(value)
    if ftype is float:
        return float(value)
    return value


def parse_overrides(config: Tacotron2Config, overrides: str) -> Tacotron2Config:
    """Apply a ``"k=v,k=v"`` override string (reference hparams.py:88-90).

    List-valued fields use ``;`` or ``+`` as the element separator so that
    ``,`` stays the pair separator, e.g. ``text_buckets=32;64;96``.
    """
    if not overrides:
        return config
    fields = {f.name: f for f in dataclasses.fields(Tacotron2Config)}
    updates = {}
    for pair in overrides.split(","):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise ValueError(f"malformed override {pair!r}; expected key=value")
        key, value = pair.split("=", 1)
        key = key.strip()
        if key not in fields:
            raise KeyError(f"unknown config field {key!r}")
        updates[key] = _coerce(value.strip(), fields[key].type_resolved
                               if hasattr(fields[key], "type_resolved")
                               else _resolve_type(fields[key]))
    return config.replace(**updates)


def _resolve_type(f: dataclasses.Field):
    hints = typing.get_type_hints(Tacotron2Config)
    return hints[f.name]


def create_config(overrides: Optional[str] = None, **kw) -> Tacotron2Config:
    """Build a config from defaults, an override string, and keyword args."""
    config = Tacotron2Config(**kw)
    if overrides:
        config = parse_overrides(config, overrides)
    return config
