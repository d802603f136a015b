"""Lyric-to-audio alignment: DTW over cross-attention, LRC timestamps.

Role parity with the reference's `core/scoring/_dtw.py:13-100` (Whisper-style
DTW + backtrace + median filter) and `dit_alignment.py:39-440`
(MusicStampsAligner: attention preprocessing, bidirectional consensus,
token→sentence stamps, `format_lrc`). Pure numpy — alignment is a host-side
post-processing step on a (lyric_tokens × audio_frames) attention matrix
captured from a single DiT "attention capture" forward (SURVEY §7.3 note on
keeping a non-fused debug attention path).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class TokenTimestamp:
    token: str
    start: float
    end: float


@dataclasses.dataclass
class SentenceTimestamp:
    text: str
    start: float
    end: float


def dtw_align(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW through a (N_text, M_frames) cost matrix.

    Returns (text_indices, frame_indices) of the optimal path. Standard
    3-move DP (diag / down / right) with backtrace, as in the reference's
    Whisper-derived `dtw_cpu`.
    """
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf, dtype=np.float64)
    trace = np.zeros((n + 1, m + 1), dtype=np.int8)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c0 = acc[i - 1, j - 1]
            c1 = acc[i - 1, j]
            c2 = acc[i, j - 1]
            best = min(c0, c1, c2)
            acc[i, j] = cost[i - 1, j - 1] + best
            trace[i, j] = 0 if best == c0 else (1 if best == c1 else 2)

    ti, fi = [], []
    i, j = n, m
    while i > 0 and j > 0:
        ti.append(i - 1)
        fi.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(ti[::-1]), np.asarray(fi[::-1])


def median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along the last axis (ref _dtw.py:90)."""
    if width <= 1:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


class MusicStampsAligner:
    """Cross-attention → token/sentence timestamps (ref dit_alignment.py:39-440)."""

    def __init__(self, tokenizer, frames_per_second: float = 12.5):
        # DiT tokens are patch-2 over 25 Hz latents → 12.5 tokens/s.
        self.tokenizer = tokenizer
        self.fps = frames_per_second

    def _preprocess_attention(
        self, attn: np.ndarray, smooth_width: int = 7
    ) -> np.ndarray:
        """Average heads/layers, normalize per text token, median-smooth."""
        while attn.ndim > 2:
            attn = attn.mean(axis=0)
        attn = attn.astype(np.float64)
        attn = attn / np.maximum(attn.sum(axis=-1, keepdims=True), 1e-9)
        return median_filter(attn, smooth_width)

    def _bidirectional_consensus(self, attn: np.ndarray) -> np.ndarray:
        """Forward+reverse DTW consensus (ref :55-101): align both directions
        and keep the geometric mean of the two path-weight maps."""
        fwd = attn
        rev = attn[::-1, ::-1]
        return np.sqrt(np.maximum(fwd, 1e-12) * np.maximum(rev[::-1, ::-1], 1e-12))

    def token_timestamps(
        self,
        attention: np.ndarray,  # (..., n_text_tokens, n_audio_frames)
        token_ids: Sequence[int],
    ) -> List[TokenTimestamp]:
        attn = self._preprocess_attention(np.asarray(attention))
        attn = self._bidirectional_consensus(attn)
        n_text = min(len(token_ids), attn.shape[0])
        attn = attn[:n_text]
        cost = -np.log(np.maximum(attn, 1e-12))
        ti, fi = dtw_align(cost)

        stamps: List[TokenTimestamp] = []
        for tok_idx in range(n_text):
            frames = fi[ti == tok_idx]
            if len(frames) == 0:
                continue
            text = self.tokenizer.decode([token_ids[tok_idx]])
            stamps.append(
                TokenTimestamp(
                    token=text,
                    start=float(frames.min()) / self.fps,
                    end=float(frames.max() + 1) / self.fps,
                )
            )
        return stamps

    def sentence_timestamps(
        self,
        attention: np.ndarray,
        token_ids: Sequence[int],
        sentences: Sequence[str],
    ) -> List[SentenceTimestamp]:
        """Group token stamps into lyric lines by greedy text matching."""
        token_stamps = self.token_timestamps(attention, token_ids)
        out: List[SentenceTimestamp] = []
        cursor = 0
        for sent in sentences:
            target = sent.strip()
            if not target:
                continue
            taken, acc = [], ""
            while cursor < len(token_stamps) and len(acc.strip()) < len(target):
                taken.append(token_stamps[cursor])
                acc += token_stamps[cursor].token
                cursor += 1
            if taken:
                out.append(SentenceTimestamp(text=target, start=taken[0].start, end=taken[-1].end))
        return out


def alignment_confidence(attention: np.ndarray) -> float:
    """Lyric alignment quality score in [0, 1] (ref lyric_score role):
    mean per-token peak attention mass after normalization — diffuse
    attention (poor alignment) scores low, sharp monotonic attention high."""
    attn = np.asarray(attention, np.float64)
    while attn.ndim > 2:
        attn = attn.mean(axis=0)
    attn = attn / np.maximum(attn.sum(axis=-1, keepdims=True), 1e-9)
    peaks = attn.max(axis=-1)
    uniform = 1.0 / attn.shape[-1]
    score = (peaks - uniform) / (1.0 - uniform + 1e-9)
    return float(np.clip(score.mean(), 0.0, 1.0))


def format_lrc(stamps: Sequence[SentenceTimestamp]) -> str:
    """Sentence timestamps → LRC text (ref dit_alignment.format_lrc)."""
    lines = []
    for s in stamps:
        minutes = int(s.start // 60)
        seconds = s.start - 60 * minutes
        lines.append(f"[{minutes:02d}:{seconds:05.2f}]{s.text}")
    return "\n".join(lines)
