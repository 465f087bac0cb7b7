"""End-to-end trainer test: tiny corpus -> epochs -> checkpoint -> resume."""

import glob
import os

import numpy as np
import pytest
import scipy.io.wavfile

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data import DataPipeline, TextMelDataset
from tacotron2_tpu.training.trainer import Trainer

pytestmark = pytest.mark.slow  # compile-heavy (tiered suite, VERDICT r1 #6)

CFG = Tacotron2Config(
    n_symbols=148, symbols_embedding_dim=16, encoder_embedding_dim=16,
    encoder_n_convolutions=2, attention_rnn_dim=20, decoder_rnn_dim=24,
    prenet_dim=8, attention_dim=12, attention_location_n_filters=4,
    attention_location_kernel_size=7, postnet_embedding_dim=16,
    postnet_n_convolutions=3, max_decoder_steps=20,
    batch_size=2, iters_per_checkpoint=2, epochs=2,
    text_buckets=(32, 64), mel_bucket_step=32, max_mel_length=96,
    mesh_shape=(2, 1),  # subset mesh: batch 2 over 2 of the 8 test devices
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer_corpus")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        wav = (rng.randn(4096 + 1024 * i) * 2000).astype(np.int16)
        path = root / f"utt{i}.wav"
        scipy.io.wavfile.write(path, 22050, wav)
        lines.append(f"{path}|utterance number {i} for training")
    filelist = root / "train.txt"
    filelist.write_text("\n".join(lines))
    return str(filelist)


def test_validation_invariant_to_partitioning(tmp_path, tmp_path_factory):
    """The exact-mean validation (VERDICT r1 #4): cycled padding rows are
    weighted out and batch means combined by real-row count, so the val loss
    must not depend on how the set is split into batches — including a
    5-item set that forces a cycled partial batch at both batch sizes."""
    root = tmp_path_factory.mktemp("val_corpus")
    rng = np.random.RandomState(1)
    lines = []
    for i in range(5):
        wav = (rng.randn(4096 + 512 * i) * 2000).astype(np.int16)
        path = root / f"utt{i}.wav"
        scipy.io.wavfile.write(path, 22050, wav)
        lines.append(f"{path}|validation utterance {i}")
    filelist = root / "val.txt"
    filelist.write_text("\n".join(lines))

    cfg = CFG.replace(eval_prenet_dropout=False)  # deterministic prenet
    trainer = Trainer(cfg, str(tmp_path / "run"))
    ds = TextMelDataset(str(filelist), cfg, shuffle=False)
    val_a = DataPipeline(ds, cfg, batch_size=2, drop_last=False,
                         num_workers=2, process_index=0, process_count=1)
    val_b = DataPipeline(ds, cfg, batch_size=4, drop_last=False,
                         num_workers=2, process_index=0, process_count=1)
    loss_a = trainer.validate(val_a, step=0)
    loss_b = trainer.validate(val_b, step=0)
    assert loss_a == pytest.approx(loss_b, rel=1e-5)


def test_fit_and_resume(corpus, tmp_path):
    out = str(tmp_path / "run")
    trainer = Trainer(CFG, out)
    ds = TextMelDataset(corpus, CFG, shuffle=False)
    pipe = DataPipeline(ds, CFG, batch_size=2, num_workers=2,
                        process_index=0, process_count=1)
    val = DataPipeline(ds, CFG, batch_size=2, drop_last=False, num_workers=2,
                       process_index=0, process_count=1)

    state = trainer.fit(pipe, val, epochs=2)
    steps_done = int(state.step)
    assert steps_done == 2 * pipe.steps_per_epoch()
    assert trainer.checkpointer.latest() is not None
    # metrics mirror written
    jsonl = glob.glob(os.path.join(out, "logs", "metrics.jsonl"))
    assert jsonl and os.path.getsize(jsonl[0]) > 0

    # resume picks up the latest checkpoint automatically
    trainer2 = Trainer(CFG, out)
    assert int(trainer2.state.step) == steps_done
    state2 = trainer2.fit(pipe, epochs=3)
    assert int(state2.step) > steps_done
