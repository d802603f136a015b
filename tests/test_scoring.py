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
    assert audio == []

    import base64

    params2, audio2 = parse_chat_messages([
        {"role": "user", "content": [
            {"type": "text", "text": "cover this"},
            {"type": "input_audio", "input_audio": {"data": base64.b64encode(b"RIFF").decode()}},
        ]},
    ])
    assert audio2 == [b"RIFF"]
    # Untagged, non-lyric text is NATURAL-LANGUAGE mode: it becomes the LM
    # sample query (ref openrouter_adapter.py:313-316); build_chat_request
    # demotes it to the caption when no LM is available.
    assert params2.sample_query == "cover this"
    assert params2.caption == ""

    from acestep_tpu.service.openrouter import build_chat_request

    p3, cfg3, _, _ = build_chat_request(
        {"messages": [{"role": "user", "content": "cover this"}]},
        llm_available=False)
    assert p3.caption == "cover this" and p3.sample_query == ""
    p4, _, _, _ = build_chat_request(
        {"messages": [{"role": "user", "content": "cover this"}]},
        llm_available=True)
    assert p4.sample_query == "cover this" and p4.caption == ""

    # Tagged mode + audio_config + body knobs (ref Openrouter_API_DOC):
    p5, cfg5, _, _ = build_chat_request({
        "messages": [{"role": "user", "content":
                      "<prompt>acoustic ballad</prompt>\n<lyrics>[Verse]\nhi</lyrics>"}],
        "audio_config": {"duration": 30, "bpm": 90, "vocal_language": "ja",
                         "instrumental": False, "format": "wav",
                         "key_scale": "C major", "time_signature": "4/4"},
        "seed": "42,123",
        "guidance_scale": 5.0,
        "batch_size": 2,
    }, llm_available=False)
    assert p5.caption == "acoustic ballad"
    assert p5.lyrics == "[Verse]\nhi"
    assert p5.duration == 30.0 and p5.bpm == 90
    assert p5.vocal_language == "ja" and p5.keyscale == "C major"
    assert p5.timesignature == "4/4" and p5.guidance_scale == 5.0
    assert cfg5["batch_size"] == 2 and cfg5["seeds"] == [42, 123]
    assert cfg5["use_random_seed"] is False

    # Lyrics-only heuristic mode ([verse]/[chorus] markers).
    p6, _, _, _ = build_chat_request({
        "messages": [{"role": "user",
                      "content": "[Verse 1]\nwalking down\n[Chorus]\ndance"}],
    }, llm_available=False)
    assert p6.lyrics.startswith("[Verse 1]") and not p6.caption

    # Explicit body `lyrics` pins the message text as the prompt (mode 4).
    p7, _, _, _ = build_chat_request({
        "messages": [{"role": "user", "content": "energetic EDM"}],
        "lyrics": "[Verse]\nfeel the rhythm",
    }, llm_available=True)
    assert p7.caption == "energetic EDM"
    assert p7.lyrics == "[Verse]\nfeel the rhythm"
    assert p7.sample_query == "" and p7.instrumental is False

    # `thinking` defaults FALSE for schema parity (ref ChatCompletionRequest,
    # openrouter_api_server.py:126) and is gated on LM availability.
    assert p7.thinking is False
    p8, _, _, _ = build_chat_request({
        "messages": [{"role": "user", "content": "<prompt>x</prompt>"}],
        "thinking": True,
    }, llm_available=True)
    assert p8.thinking is True
    p9, _, _, _ = build_chat_request({
        "messages": [{"role": "user", "content": "<prompt>x</prompt>"}],
        "thinking": True,
    }, llm_available=False)
    assert p9.thinking is False


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


def test_bidirectional_consensus_recovers_noisy_diagonal():
    """Synthetic alignment (VERDICT r2 next #6): a known token↔frame diagonal
    corrupted by a horizontal crossing line (one token attending everywhere),
    a vertical crossing line (every token attending one frame) and uniform
    noise. The bidirectional consensus must (a) measurably change the result
    vs single-direction DTW and (b) recover stamps CLOSER to ground truth."""
    rng = np.random.default_rng(0)
    tok = ByteFallbackTokenizer()
    n_tok, n_frames = 16, 64
    token_ids = tok.encode("abcdefghijklmnop")[:n_tok]
    assert len(token_ids) == n_tok

    truth_start = {i: 4 * i for i in range(n_tok)}
    attn = np.zeros((n_tok, n_frames))
    for i in range(n_tok):
        attn[i, 4 * i : 4 * i + 4] = 1.0
    noisy = attn.copy()
    noisy[5, :] += 0.9          # horizontal crossing line
    noisy[:, 30] += 0.9         # vertical crossing line
    noisy += rng.uniform(0.0, 0.25, noisy.shape)
    # Mimic the capture path's orientation: probabilities over text per frame.
    probs = noisy / noisy.sum(axis=0, keepdims=True)

    fps = 4.0
    aligner = MusicStampsAligner(tok, frames_per_second=fps)

    def mean_start_err(stamps):
        errs = []
        by_tok = {s.token: s for s in stamps}
        for i, tid in enumerate(token_ids):
            s = by_tok.get(tok.decode([tid]))
            if s is None:
                errs.append(n_frames / fps)  # dropped token: max penalty
            else:
                errs.append(abs(s.start - truth_start[i] / fps))
        return float(np.mean(errs))

    consensus_stamps = aligner.token_timestamps(probs, token_ids)

    # Single-direction baseline: row-normalized attention straight into DTW
    # (what the aligner effectively did before the consensus was real).
    row = probs / np.maximum(probs.sum(axis=-1, keepdims=True), 1e-12)
    ti, fi = dtw_align(-row)
    single_stamps = []
    from acestep_tpu.scoring.alignment import TokenTimestamp

    for i in range(n_tok):
        frames = fi[ti == i]
        if len(frames):
            single_stamps.append(TokenTimestamp(
                token=tok.decode([token_ids[i]]),
                start=float(frames.min()) / fps,
                end=float(frames.max() + 1) / fps,
            ))

    err_consensus = mean_start_err(consensus_stamps)
    err_single = mean_start_err(single_stamps)
    # (a) the consensus is not a no-op and (b) it improves stamp error
    assert err_consensus < err_single, (err_consensus, err_single)
    # (c) absolute quality: within one true token-span (1 s) on average
    assert err_consensus < 1.0, err_consensus
