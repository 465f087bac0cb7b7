"""End-to-end trainer test: tiny corpus -> epochs -> checkpoint -> resume."""

import glob
import os

import numpy as np
import pytest
import scipy.io.wavfile

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data import DataPipeline, TextMelDataset
from tacotron2_tpu.training.trainer import Trainer

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
