"""Config system tests (dataclass + k=v override string)."""

import pytest

from tacotron2_tpu.config import Tacotron2Config, create_config, parse_overrides


def test_defaults_match_reference():
    # Reference defaults: /root/reference/hparams.py:12-85
    c = Tacotron2Config()
    assert c.epochs == 500
    assert c.sampling_rate == 22050
    assert c.filter_length == 1024
    assert c.hop_length == 256
    assert c.n_mel_channels == 80
    assert c.mel_fmax == 8000.0
    assert c.symbols_embedding_dim == 512
    assert c.attention_location_kernel_size == 31
    assert c.learning_rate == 1e-3
    assert c.weight_decay == 1e-6
    assert c.grad_clip_thresh == 1.0
    assert c.batch_size == 64
    assert c.mask_padding is True
    assert c.n_symbols == 148


def test_override_string():
    c = create_config("batch_size=16,learning_rate=5e-4,mask_padding=false")
    assert c.batch_size == 16
    assert c.learning_rate == 5e-4
    assert c.mask_padding is False


def test_override_list_field():
    c = create_config("text_buckets=32;64;96,text_cleaners=basic_cleaners")
    assert c.text_buckets == (32, 64, 96)
    assert c.text_cleaners == ["basic_cleaners"]


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        parse_overrides(Tacotron2Config(), "no_such_param=1")


def test_frozen():
    c = Tacotron2Config()
    with pytest.raises(Exception):
        c.batch_size = 1  # type: ignore[misc]
    c2 = c.replace(batch_size=8)
    assert c2.batch_size == 8 and c.batch_size == 64


class TestValidate:
    def test_default_config_valid(self):
        Tacotron2Config().validate()

    def test_even_kernel_rejected(self):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="odd"):
            Tacotron2Config(encoder_kernel_size=4).validate()

    def test_arpabet_requires_dict(self):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="cmudict_path"):
            Tacotron2Config(p_arpabet=0.5).validate()

    def test_bad_dtype_rejected(self):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="compute_dtype"):
            Tacotron2Config(compute_dtype="float16").validate()

    def test_bucket_mismatch_rejected(self):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="max_mel_length"):
            Tacotron2Config(max_mel_length=1000,
                            mel_bucket_step=128).validate()
