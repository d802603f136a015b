"""PMI / perplexity reward scoring of generated audio codes via the LM.

Role parity with the reference's `core/scoring/lm_score.py:19-471`:
PMI(codes; condition) = log P(codes | condition) − log P(codes), normalized
through tanh; composite reward mixes PMI, top-k recall of code tokens, and
metadata recall. Log-probs come from one teacher-forced jitted forward over
the (prompt + codes) sequence — no per-token loop.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.models import qwen3


def pmi_score(log_prob_conditional: float, log_prob_unconditional: float) -> float:
    """Pointwise mutual information (ref lm_score.py:19-39)."""
    return log_prob_conditional - log_prob_unconditional


def pmi_to_normalized_score(pmi: float, scale: float = 0.1) -> float:
    """Map PMI to (0, 1) via tanh squashing (ref :42-68)."""
    return 0.5 * (math.tanh(scale * pmi) + 1.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _token_log_probs(params, cfg, input_ids, target_mask):
    """Per-token log P(token | prefix) over positions where target_mask = 1."""
    hidden = qwen3.forward_hidden(params, cfg, input_ids)
    logits = qwen3.logits_from_hidden(params, cfg, hidden).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # logits at position i predict token i+1
    targets = input_ids[:, 1:]
    token_logp = jnp.take_along_axis(logp[:, :-1], targets[..., None], axis=-1)[..., 0]
    mask = target_mask[:, 1:].astype(jnp.float32)
    return token_logp, mask, logits[:, :-1]


def sequence_log_prob(
    llm_handler, prompt: str, continuation_ids: List[int]
) -> Tuple[float, float]:
    """(total log-prob, mean log-prob) of continuation tokens given prompt."""
    from acestep_tpu.lm.constrained import _encode

    prompt_ids = _encode(llm_handler.tokenizer, prompt)
    ids = np.asarray([prompt_ids + list(continuation_ids)], np.int32)
    mask = np.zeros_like(ids)
    mask[0, len(prompt_ids):] = 1
    token_logp, m, _ = _token_log_probs(
        llm_handler.params, llm_handler.config, jnp.asarray(ids), jnp.asarray(mask)
    )
    total = float(jnp.sum(token_logp * m))
    n = float(jnp.sum(m))
    return total, total / max(n, 1.0)


def topk_recall(
    llm_handler, prompt: str, continuation_ids: List[int], k: int = 10
) -> float:
    """Fraction of continuation tokens within the model's top-k (ref :181-233)."""
    from acestep_tpu.lm.constrained import _encode

    prompt_ids = _encode(llm_handler.tokenizer, prompt)
    ids = np.asarray([prompt_ids + list(continuation_ids)], np.int32)
    mask = np.zeros_like(ids)
    mask[0, len(prompt_ids):] = 1
    token_logp, m, logits = _token_log_probs(
        llm_handler.params, llm_handler.config, jnp.asarray(ids), jnp.asarray(mask)
    )
    kth = jax.lax.top_k(logits, k)[0][..., -1]
    targets = ids[0, 1:]
    target_logits = np.asarray(
        jnp.take_along_axis(logits[0], jnp.asarray(targets)[:, None], axis=-1)[:, 0]
    )
    in_topk = (target_logits >= np.asarray(kth[0])) & (np.asarray(m[0]) > 0)
    n = np.asarray(m[0]).sum()
    return float(in_topk.sum() / max(n, 1.0))


def metadata_recall(generated_meta: Dict[str, Any], reference_meta: Dict[str, Any]) -> float:
    """Fraction of reference metadata fields the generation reproduced (ref :235-261)."""
    if not reference_meta:
        return 1.0
    hits, total = 0, 0
    for k, v in reference_meta.items():
        if v in (None, "", "N/A"):
            continue
        total += 1
        g = generated_meta.get(k)
        if g is None:
            continue
        if str(g).strip().lower() == str(v).strip().lower():
            hits += 1
        elif k in ("bpm", "duration"):
            try:
                if abs(float(g) - float(v)) / max(abs(float(v)), 1e-6) < 0.1:
                    hits += 1
            except (TypeError, ValueError):
                pass
    return hits / total if total else 1.0


def calculate_reward_score(
    llm_handler,
    caption: str,
    lyrics: str,
    audio_codes: str,
    *,
    generated_meta: Optional[Dict[str, Any]] = None,
    reference_meta: Optional[Dict[str, Any]] = None,
    pmi_weight: float = 0.5,
    recall_weight: float = 0.3,
    meta_weight: float = 0.2,
    topk: int = 10,
) -> Dict[str, float]:
    """Composite reward (ref calculate_reward_score :292-386)."""
    codes = llm_handler.parse_lm_output(audio_codes)[1] or audio_codes
    from acestep_tpu.lm.constrained import _encode

    code_ids = _encode(llm_handler.tokenizer, codes)[:1024]
    if not code_ids:
        return {"reward": 0.0, "pmi": 0.0, "pmi_normalized": 0.0, "topk_recall": 0.0, "meta_recall": 0.0}

    cond_prompt = llm_handler.build_formatted_prompt(caption, lyrics, generation_phase="codes")
    uncond_prompt = llm_handler.build_formatted_prompt(
        "", lyrics, is_negative_prompt=True, generation_phase="cot"
    )
    lp_cond, _ = sequence_log_prob(llm_handler, cond_prompt, code_ids)
    lp_uncond, _ = sequence_log_prob(llm_handler, uncond_prompt, code_ids)
    pmi = pmi_score(lp_cond, lp_uncond) / max(len(code_ids), 1)
    pmi_n = pmi_to_normalized_score(pmi, scale=1.0)
    recall = topk_recall(llm_handler, cond_prompt, code_ids, k=topk)
    meta = metadata_recall(generated_meta or {}, reference_meta or {})
    reward = pmi_weight * pmi_n + recall_weight * recall + meta_weight * meta
    return {
        "reward": float(reward),
        "pmi": float(pmi),
        "pmi_normalized": float(pmi_n),
        "topk_recall": float(recall),
        "meta_recall": float(meta),
    }
