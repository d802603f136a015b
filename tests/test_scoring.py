"""Scoring/alignment tests: PMI math, DTW, LRC formatting, reward composite."""

import numpy as np
import pytest

import jax.numpy as jnp

from acestep_tpu.scoring.alignment import (
    MusicStampsAligner,
    SentenceTimestamp,
    dtw_align,
    format_lrc,
    median_filter,
)
from acestep_tpu.scoring.lm_score import (
    metadata_recall,
    pmi_score,
    pmi_to_normalized_score,
)
from acestep_tpu.utils.tokenizer import ByteFallbackTokenizer


def test_pmi_math():
    assert pmi_score(-10.0, -15.0) == 5.0
    assert 0.0 < pmi_to_normalized_score(-3.0) < 0.5
    assert 0.5 < pmi_to_normalized_score(3.0) < 1.0
    assert pmi_to_normalized_score(0.0) == 0.5


def test_metadata_recall():
    ref = {"bpm": 120, "keyscale": "C major", "language": "en"}
    assert metadata_recall({"bpm": 120, "keyscale": "C major", "language": "en"}, ref) == 1.0
    assert metadata_recall({"bpm": 125, "keyscale": "D minor", "language": "en"}, ref) == pytest.approx(2 / 3)
    assert metadata_recall({}, ref) == 0.0
    assert metadata_recall({}, {}) == 1.0


def test_dtw_monotonic_path():
    # Diagonal-dominant cost → path close to the diagonal
    n, m = 6, 12
    cost = np.ones((n, m))
    for i in range(n):
        cost[i, 2 * i] = 0.0
        cost[i, 2 * i + 1] = 0.0
    ti, fi = dtw_align(cost)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == m - 1
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()


def test_median_filter():
    x = np.asarray([[1.0, 100.0, 1.0, 1.0, 1.0]])
    y = median_filter(x, 3)
    assert y[0, 1] == 1.0  # spike removed


def test_token_timestamps_and_lrc():
    tok = ByteFallbackTokenizer()
    token_ids = tok.encode("lala")  # 4 tokens
    n_frames = 40
    attn = np.zeros((len(token_ids), n_frames))
    for i in range(len(token_ids)):
        attn[i, i * 10 : (i + 1) * 10] = 1.0
    aligner = MusicStampsAligner(tok, frames_per_second=10.0)
    stamps = aligner.token_timestamps(attn, token_ids)
    assert len(stamps) == len(token_ids)
    assert stamps[0].start == 0.0
    assert stamps[0].end <= stamps[1].end
    assert stamps[-1].end == pytest.approx(4.0, abs=0.2)

    lrc = format_lrc(
        [SentenceTimestamp("hello world", 0.0, 2.0), SentenceTimestamp("second line", 65.5, 70.0)]
    )
    lines = lrc.split("\n")
    assert lines[0] == "[00:00.00]hello world"
    assert lines[1] == "[01:05.50]second line"


def test_openrouter_message_parsing():
    from acestep_tpu.service.openrouter import parse_chat_messages

    params, audio = parse_chat_messages([
        {"role": "user", "content": "an epic orchestral piece, 120 bpm, 45 seconds\n# Lyrics\nhello\nworld"},
    ])
    assert params.bpm == 120
    assert params.duration == 45.0
    assert params.lyrics == "hello\nworld"
    assert audio is None

    import base64

    params2, audio2 = parse_chat_messages([
        {"role": "user", "content": [
            {"type": "text", "text": "cover this"},
            {"type": "input_audio", "input_audio": {"data": base64.b64encode(b"RIFF").decode()}},
        ]},
    ])
    assert audio2 == b"RIFF"
    assert params2.caption == "cover this"


def test_lyric_quality_score_diagonal_vs_scrambled():
    """Composite score (ref dit_score.py cov² · mono² · conf): a clean
    monotonic diagonal alignment scores high; scrambled energy scores lower."""
    from acestep_tpu.scoring.lyric_score import MusicLyricScorer

    class Tok:
        def decode(self, ids):
            return {0: "[verse]", 1: "hel", 2: "lo", 3: "world", 4: "la"}.get(ids[0], "x")

    rng = np.random.default_rng(0)
    T, F = 12, 48
    diag = np.zeros((T, F))
    for i in range(T):
        lo = int(i * F / T)
        diag[i, lo : lo + 6] = 1.0
    attn = diag[None] + rng.random((1, T, F)) * 0.02  # one pre-selected head map
    ids = [1, 2, 3, 4] * 3

    scorer = MusicLyricScorer(Tok())
    good = scorer.score(attn, ids, {})
    assert good["lyrics_score"] > 0.5, good
    assert good["coverage"] == 1.0
    assert good["monotonicity"] == 1.0

    scrambled = rng.permutation(diag.reshape(-1)).reshape(1, T, F)
    bad = scorer.score(scrambled, ids, {})
    assert bad["lyrics_score"] < good["lyrics_score"]


def test_lyric_quality_score_tag_mask_and_capture_dict():
    from acestep_tpu.scoring.lyric_score import MusicLyricScorer

    class Tok:
        def decode(self, ids):
            return {0: "[", 1: "chorus", 2: "]", 3: "word"}.get(ids[0], "w")

    scorer = MusicLyricScorer(Tok())
    mask = scorer.token_type_mask([0, 1, 2, 3, 3])
    assert mask.tolist() == [0, 0, 0, 1, 1]

    # capture-dict input ({layer: (B, H, T, F)}), head selection by config
    rng = np.random.default_rng(1)
    cap = {2: rng.random((1, 4, 6, 20)).astype(np.float32)}
    out = scorer.score(cap, [3] * 6, {2: [1, 3]})
    assert 0.0 <= out["lyrics_score"] <= 1.0
