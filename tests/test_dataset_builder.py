"""Dataset builder: scan/sidecar/CSV conventions + LM-assisted labeling +
preprocess-to-tensors (ref dataset_builder_modules/{scan,csv_metadata,
label_single,preprocess}.py)."""

import io
import json
import os
import wave

import numpy as np
import pytest

import jax.numpy as jnp

from acestep_tpu.config import AceStepConfig, OobleckConfig, Qwen3Config
from acestep_tpu.training.dataset_builder import DatasetBuilder, load_csv_metadata

TINY_DIT = AceStepConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16, sliding_window=8,
    text_hidden_dim=32, num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=1, num_attention_pooler_hidden_layers=1,
    fsq_dim=64, timbre_fix_frame=10,
)
TINY_VAE = OobleckConfig(
    encoder_hidden_size=128, downsampling_ratios=(2, 4, 4), channel_multiples=(1, 1, 1),
    decoder_channels=16, decoder_input_channels=64, audio_channels=2, sampling_rate=800,
)
TINY_TEXT = Qwen3Config(
    vocab_size=300, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=8,
)


def _write_wav(path, seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(2 * 48_000 * seconds)) * 2000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48_000)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def handlers():
    import acestep_tpu.pipeline.handler as H
    from acestep_tpu.lm.handler import LLMHandler
    from acestep_tpu.pipeline.handler import AceStepHandler

    H.LATENT_BUCKETS = (64, 128)
    H.TEXT_BUCKETS = (32, 64)
    H.LYRIC_BUCKETS = (32, 64)
    dit = AceStepHandler(TINY_DIT, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
    dit.initialize_service(random_init=True)
    llm = LLMHandler(TINY_TEXT, dtype=jnp.float32)
    llm.initialize(random_init=True)
    return dit, llm


@pytest.fixture()
def audio_dir(tmp_path):
    d = str(tmp_path / "songs")
    os.makedirs(d)
    _write_wav(os.path.join(d, "a.wav"), seed=1)
    _write_wav(os.path.join(d, "b.wav"), seed=2)
    _write_wav(os.path.join(d, "c.wav"), seed=3)
    with open(os.path.join(d, "a.caption.txt"), "w") as f:
        f.write("a dreamy synth piece")
    with open(os.path.join(d, "a.lyrics.txt"), "w") as f:
        f.write("la la la")
    with open(os.path.join(d, "b.json"), "w") as f:
        json.dump({"bpm": 100, "keyscale": "C major", "caption": "jazz trio"}, f)
    with open(os.path.join(d, "meta.csv"), "w") as f:
        f.write("file;bpm;key;caption\nc.wav;128;A minor;csv caption\n")
    return d


def test_scan_sidecar_json_csv(handlers, audio_dir):
    dit, _ = handlers
    b = DatasetBuilder(dit)
    samples, msg = b.scan_directory(audio_dir)
    assert len(samples) == 3, msg
    by = {s.filename: s for s in samples}
    assert by["a.wav"].caption == "a dreamy synth piece"
    assert by["a.wav"].lyrics == "la la la"
    assert by["b.wav"].bpm == 100 and by["b.wav"].keyscale == "C major"
    assert by["c.wav"].bpm == 128  # CSV with ';' delimiter sniffed
    assert by["c.wav"].keyscale == "A minor"
    assert by["c.wav"].caption == "csv caption"


def test_csv_metadata_delimiters(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "x.csv"), "w") as f:
        f.write("File,BPM,Caption\ns.wav,90.0,hello\n")
    meta = load_csv_metadata(d)
    assert meta["s.wav"]["bpm"] == 90
    assert meta["s.wav"]["caption"] == "hello"


def test_lm_assisted_labeling(handlers, audio_dir):
    """label_all runs understand-on-codes; CSV fields take precedence."""
    dit, llm = handlers
    b = DatasetBuilder(dit, llm)
    b.scan_directory(audio_dir)
    msgs = b.label_all(temperature=0.7)
    assert len(msgs) == 3
    by = {s.filename: s for s in b.samples}
    # CSV bpm preserved over whatever the (random-weight) LM said
    assert by["c.wav"].bpm == 128
    assert by["c.wav"].label_source in ("lm", "")
    path = b.save_labels()
    assert os.path.exists(path)
    b2 = DatasetBuilder(dit, llm)
    b2.directory = audio_dir
    assert b2.load_labels() == 3


def test_preprocess_to_tensors_manifest(handlers, audio_dir, tmp_path):
    from acestep_tpu.training.dataset import PreprocessedDataset

    dit, _ = handlers
    b = DatasetBuilder(dit)
    b.scan_directory(audio_dir)
    out_dir = str(tmp_path / "tensors")
    written, msg = b.preprocess_to_tensors(out_dir)
    assert len(written) == 3, msg
    ds = PreprocessedDataset(out_dir)
    assert len(ds) == 3
    s = ds.load(0)
    assert "target_latents" in s and "encoder_hidden_states" in s
