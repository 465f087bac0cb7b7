"""HiFi-GAN vocoder training: adversarial (MPD + MSD) + feature-matching
+ mel-reconstruction objectives, two AdamW optimizers, one jitted step.

Companion to the likelihood-trained flow vocoder
(training/vocoder_trainer.py); consumes the same ``segment_sampler``
(random aligned (audio, mel) crops). The whole D-then-G update is a single
pure function — both discriminator and generator passes are feed-forward
conv stacks, so one jit covers the full GAN step with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from tacotron2_tpu.audio.mel import MelConfig, mel_spectrogram
from tacotron2_tpu.models import hifigan
from tacotron2_tpu.training.checkpoint import Checkpointer
from tacotron2_tpu.training.vocoder_trainer import VocoderBatch, segment_sampler


class HiFiGANTrainState(NamedTuple):
    step: jnp.ndarray
    gen_params: dict
    mpd_params: list
    msd_params: list
    gen_opt: tuple
    disc_opt: tuple


class HiFiGANLosses(NamedTuple):
    disc: jnp.ndarray
    gen_adv: jnp.ndarray
    feature: jnp.ndarray
    mel_l1: jnp.ndarray

    @property
    def gen_total(self) -> jnp.ndarray:
        return self.gen_adv + self.feature + 45.0 * self.mel_l1


def make_optimizer(learning_rate: float = 2e-4, lr_decay: float = 0.999,
                   decay_every: int = 1000, b1: float = 0.8,
                   b2: float = 0.99) -> optax.GradientTransformation:
    """AdamW with the paper's betas and a stepped exponential decay
    (the reference HiFi-GAN decays 0.999 per epoch; here per
    ``decay_every`` steps so the schedule is dataset-size independent)."""
    schedule = optax.exponential_decay(learning_rate, decay_every, lr_decay,
                                       staircase=True)
    return optax.adamw(schedule, b1=b1, b2=b2)


def create_hifigan_state(rng: jax.Array, cfg: hifigan.HiFiGANConfig,
                         learning_rate: float = 2e-4) -> HiFiGANTrainState:
    kg, kp, ks = jax.random.split(rng, 3)
    gen = hifigan.init_generator(kg, cfg)
    mpd = hifigan.init_mpd(kp, cfg)
    msd = hifigan.init_msd(ks, cfg)
    tx = make_optimizer(learning_rate)
    return HiFiGANTrainState(
        jnp.zeros((), jnp.int32), gen, mpd, msd,
        tx.init(gen), tx.init({"mpd": mpd, "msd": msd}))


def hifigan_train_step(state: HiFiGANTrainState, batch: VocoderBatch,
                       cfg: hifigan.HiFiGANConfig, mel_cfg: MelConfig,
                       learning_rate: float = 2e-4,
                       ) -> Tuple[HiFiGANTrainState, HiFiGANLosses]:
    """One GAN step: update discriminators on (real, detached fake), then
    the generator against the UPDATED discriminators (the standard
    alternating schedule collapsed into one jitted function)."""
    tx = make_optimizer(learning_rate)
    y_hat = hifigan.generator(state.gen_params, batch.mel, cfg)

    # ---- discriminator update (fake detached)
    def d_loss_fn(d_params):
        real_lg, _ = hifigan.discriminate(
            d_params["mpd"], d_params["msd"], batch.audio, cfg)
        fake_lg, _ = hifigan.discriminate(
            d_params["mpd"], d_params["msd"],
            jax.lax.stop_gradient(y_hat), cfg)
        return hifigan.discriminator_loss(real_lg, fake_lg)

    d_params = {"mpd": state.mpd_params, "msd": state.msd_params}
    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
    d_updates, disc_opt = tx.update(d_grads, state.disc_opt, d_params)
    d_params = optax.apply_updates(d_params, d_updates)

    # ---- generator update against the updated discriminators
    mel_real = mel_spectrogram(batch.audio, mel_cfg)

    def g_loss_fn(gen_params):
        y_g = hifigan.generator(gen_params, batch.mel, cfg)
        fake_lg, fake_fm = hifigan.discriminate(
            d_params["mpd"], d_params["msd"], y_g, cfg)
        real_lg, real_fm = hifigan.discriminate(
            d_params["mpd"], d_params["msd"], batch.audio, cfg)
        adv = hifigan.generator_adversarial_loss(fake_lg)
        fm = hifigan.feature_matching_loss(
            jax.tree.map(jax.lax.stop_gradient, real_fm), fake_fm)
        mel_l1 = jnp.mean(jnp.abs(mel_spectrogram(y_g, mel_cfg) - mel_real))
        return adv + fm + 45.0 * mel_l1, (adv, fm, mel_l1)

    (_, (adv, fm, mel_l1)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True)(state.gen_params)
    g_updates, gen_opt = tx.update(g_grads, state.gen_opt, state.gen_params)
    gen_params = optax.apply_updates(state.gen_params, g_updates)

    new_state = HiFiGANTrainState(
        state.step + 1, gen_params, d_params["mpd"], d_params["msd"],
        gen_opt, disc_opt)
    return new_state, HiFiGANLosses(d_loss, adv, fm, mel_l1)


def train_hifigan(dataset, out_dir: str,
                  cfg: hifigan.HiFiGANConfig = hifigan.HiFiGANConfig(),
                  mel_cfg: MelConfig = MelConfig(),
                  steps: int = 100000, batch_size: int = 16,
                  segment_mels: int = 32, learning_rate: float = 2e-4,
                  log_every: int = 100, checkpoint_every: int = 5000,
                  seed: int = 1234) -> HiFiGANTrainState:
    """Minimal HiFi-GAN training loop (tools/train_hifigan.py wraps this)."""
    assert cfg.hop_length == mel_cfg.hop_length, (
        "generator upsampling must multiply out to the mel hop length")
    state = create_hifigan_state(jax.random.PRNGKey(seed), cfg, learning_rate)
    ckpt = Checkpointer(out_dir)
    step_fn = jax.jit(functools.partial(
        hifigan_train_step, cfg=cfg, mel_cfg=mel_cfg,
        learning_rate=learning_rate))
    batches = segment_sampler(dataset, mel_cfg, segment_mels, batch_size,
                              seed)
    for i, batch in enumerate(batches):
        if i >= steps:
            break
        state, losses = step_fn(state, batch)
        if i % log_every == 0:
            print(f"hifigan step {int(state.step)}: "
                  f"d {float(losses.disc):.4f} adv {float(losses.gen_adv):.4f} "
                  f"fm {float(losses.feature):.4f} "
                  f"mel {float(losses.mel_l1):.4f}", flush=True)
        if int(state.step) % checkpoint_every == 0:
            ckpt.save(state)
    ckpt.save(state, wait=True)
    return state
