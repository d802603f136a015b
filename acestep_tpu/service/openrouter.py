"""OpenAI chat-completions-compatible façade over the generation pipeline.

Role parity with the reference's OpenRouter adapter
(`acestep/openrouter_adapter.py:199-773`, server at
`openrouter/openrouter_api_server.py`): parse chat messages (text prompts and
optional base64 audio parts) into a GenerationParams, run generation, return
a chat completion whose content embeds base64 audio. Mounted as extra routes
on the stdlib API server.
"""

from __future__ import annotations

import base64
import json
import re
import time
import uuid
from typing import Any, Dict, List, Optional, Tuple

from acestep_tpu.service.params import GenerationConfig, GenerationParams

_DURATION_RE = re.compile(r"(\d+)\s*(?:s\b|sec|seconds?)", re.IGNORECASE)
_BPM_RE = re.compile(r"(\d+)\s*bpm", re.IGNORECASE)
_LYRICS_RE = re.compile(r"(?:#+\s*lyrics?|\[lyrics?\])\s*\n(.*)", re.IGNORECASE | re.DOTALL)


def parse_chat_messages(messages: List[Dict[str, Any]]) -> Tuple[GenerationParams, List[bytes]]:
    """Chat messages → GenerationParams + ALL uploaded audio parts, in order.

    Multiple input_audio blocks are collected like multiple images (ref
    openrouter_adapter.py:199-330); `route_chat_audio` assigns them to
    src_audio / reference_audio by task type."""
    caption_parts: List[str] = []
    lyrics = ""
    audio_parts: List[bytes] = []

    for msg in messages:
        if msg.get("role") != "user":
            continue
        content = msg.get("content")
        parts = content if isinstance(content, list) else [{"type": "text", "text": str(content)}]
        for part in parts:
            if part.get("type") == "text":
                text = part.get("text", "")
                m = _LYRICS_RE.search(text)
                if m:
                    lyrics = m.group(1).strip()
                    text = text[: m.start()].strip()
                caption_parts.append(text)
            elif part.get("type") in ("input_audio", "audio"):
                data = part.get("input_audio", part.get("audio", {}))
                b64 = data.get("data") if isinstance(data, dict) else data
                if b64:
                    audio_parts.append(base64.b64decode(b64))

    caption = " ".join(p for p in caption_parts if p).strip()
    params = GenerationParams(caption=caption, lyrics=lyrics)
    m = _DURATION_RE.search(caption)
    if m:
        params.duration = float(m.group(1))
    m = _BPM_RE.search(caption)
    if m:
        params.bpm = int(m.group(1))
    if lyrics:
        params.instrumental = False
    return params, audio_parts


# Tasks whose PRIMARY audio is the content being edited/covered — for these
# the first upload is src_audio (the reference's _SRC_AUDIO_TASK_TYPES,
# openrouter_adapter.py:712).
SRC_AUDIO_TASK_TYPES = frozenset({"cover", "repaint", "lego", "extract", "complete"})


def route_chat_audio(
    task_type: Optional[str], n_audio: int
) -> Tuple[str, Optional[int], Optional[int]]:
    """Audio-part routing by task (ref openrouter_adapter.py:700-722,364-369).

    Returns (resolved_task_type, src_index, reference_index) into the
    collected audio-part list:
      - cover/repaint/lego/extract/complete: audio[0] → src_audio (the song
        being edited/covered), audio[1] → reference_audio (timbre style);
      - text2music (default): audio[0] → reference_audio, and the task
        auto-promotes to "music_continuation" (style-conditioned generation —
        downstream it runs the text2music path with reference conditioning,
        exactly as in the reference where the label exists only here).
    An explicit task_type from the request body is honored as-is."""
    task = task_type or "text2music"
    if n_audio <= 0:
        return task, None, None
    if task in SRC_AUDIO_TASK_TYPES:
        return task, 0, (1 if n_audio > 1 else None)
    if task == "text2music":
        task = "music_continuation"
    return task, None, 0


def chat_body_overrides(body: Dict[str, Any]) -> Dict[str, Any]:
    """Coerced one-call LM pre-phase flags from the chat request body —
    shared by the streaming and non-streaming paths so a client sending
    e.g. `sample_mode: 1` gets identical typing on both."""
    out: Dict[str, Any] = {}
    for k in ("sample_mode", "use_format"):
        if body.get(k) is not None:
            out[k] = bool(body[k])
    if body.get("sample_query"):
        out["sample_query"] = str(body["sample_query"])
    return out


def write_chat_audio_temp_files(audio_parts: List[bytes], prefix: str = "acestep_chat_") -> List[str]:
    """Persist uploaded audio parts to temp files; caller owns cleanup."""
    import tempfile

    paths: List[str] = []
    for data in audio_parts:
        with tempfile.NamedTemporaryFile(suffix=".wav", prefix=prefix, delete=False) as f:
            f.write(data)
            paths.append(f.name)
    return paths


def lm_sampling_overrides(body: Dict[str, Any]) -> Dict[str, Any]:
    """OpenAI request sampling fields → LM sampling params, shared by the
    streaming and non-streaming chat paths (ref openrouter_adapter.py:386-388
    maps temperature/top_p/top_k onto lm_*; lm_-prefixed fields pass through)."""
    out: Dict[str, Any] = {}
    for src, dst in (("temperature", "lm_temperature"), ("top_p", "lm_top_p"),
                     ("top_k", "lm_top_k")):
        if body.get(src) is not None:
            out[dst] = body[src]
    for k in ("lm_temperature", "lm_top_p", "lm_top_k", "lm_cfg_scale",
              "lm_repetition_penalty", "lm_negative_prompt"):
        if body.get(k) is not None:
            out[k] = body[k]
    return out


def chat_completion_response(
    model: str,
    result,
    *,
    include_audio_base64: bool = True,
) -> Dict[str, Any]:
    """GenerationResult → OpenAI chat.completion payload with audio content."""
    content: List[Dict[str, Any]] = []
    if result.success:
        meta = result.extra_outputs.get("lm_metadata", {})
        text = result.status_message
        if meta:
            text += "\n" + json.dumps(meta)
        content.append({"type": "text", "text": text})
        for a in result.audios:
            path = a.get("path")
            if include_audio_base64 and path:
                with open(path, "rb") as f:
                    b64 = base64.b64encode(f.read()).decode()
                content.append({
                    "type": "audio",
                    "audio": {"data": b64, "format": path.rsplit(".", 1)[-1]},
                })
            elif path:
                content.append({"type": "text", "text": f"audio: {path}"})
    else:
        content.append({"type": "text", "text": f"error: {result.error}"})

    return {
        "id": f"chatcmpl-{uuid.uuid4().hex[:24]}",
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {
                "index": 0,
                "message": {"role": "assistant", "content": content},
                "finish_reason": "stop" if result.success else "error",
            }
        ],
        "usage": {"prompt_tokens": 0, "completion_tokens": 0, "total_tokens": 0},
    }


def handle_chat_completions(
    dit_handler, llm_handler, body: Dict[str, Any], output_dir: str
) -> Dict[str, Any]:
    """POST /v1/chat/completions implementation."""
    from acestep_tpu.service.inference import generate_music

    messages = body.get("messages", [])
    model = body.get("model", "acestep-v15-tpu")
    params, audio_parts = parse_chat_messages(messages)
    # Route uploads by task: src_audio carries the content for the
    # cover-family tasks; reference_audio is always timbre-only (ref
    # openrouter_adapter.py:700-722 — a "cover my song" chat upload MUST be
    # src_audio or the cover generates fresh audio with the upload as style).
    task, src_i, ref_i = route_chat_audio(body.get("task_type"), len(audio_parts))
    params.task_type = task
    tmp_uploads = write_chat_audio_temp_files(audio_parts)
    if src_i is not None:
        params.src_audio = tmp_uploads[src_i]
    if ref_i is not None:
        params.reference_audio = tmp_uploads[ref_i]
    params.thinking = bool(body.get("thinking", True)) and llm_handler is not None
    for k, v in chat_body_overrides(body).items():
        setattr(params, k, v)
    for k, v in lm_sampling_overrides(body).items():
        setattr(params, k, v)
    cfg = GenerationConfig(batch_size=1, audio_format="wav", output_dir=output_dir)
    try:
        result = generate_music(dit_handler, llm_handler, params, cfg)
    finally:
        # Uploads were only needed during generation (ref parity: the job
        # server cleans multipart temp files after the job turns terminal).
        import os

        for p in tmp_uploads:
            try:
                os.remove(p)
            except OSError:
                pass
    return chat_completion_response(model, result)


def models_response(model_ids: Optional[List[str]] = None) -> Dict[str, Any]:
    """OpenAI-format model listing (ref openrouter_api_server.py GET
    /v1/models); merged into the job server's /v1/models response so OpenAI
    clients read `.data` while the studio UI keeps reading `.models`."""
    return {
        "object": "list",
        "data": [
            {
                "id": mid,
                "object": "model",
                "created": 0,
                "owned_by": "acestep-tpu",
                "capabilities": {"audio_generation": True},
            }
            for mid in (model_ids or ["acestep-v15-tpu"])
        ],
    }
