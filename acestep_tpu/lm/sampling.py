"""Device-side sampling for the 5 Hz planner LM.

Replaces the reference's nano-vllm sampler + logit-space CFG loop
(`llm_inference.py:2414-2533`, `nanovllm/layers/sampler.py`) with jitted JAX
programs:

- `cfg_combine`: uncond + scale·(cond − uncond) in float32 (ref :2505-2510)
- `sample`: temperature / top-k / top-p over full logits
- `sample_allow` / `sample_block`: FSM-constrained sampling via gather /
  scatter-mask — the device-side counterpart of the FSM's StepSpec
- `generate_codes_scan`: the WHOLE audio-code phase as one lax.scan over the
  KV-cache decode step — no host round-trips for the ~5·duration tokens that
  dominate LM time (the nano-vllm CUDA-graph loop equivalent, but one compiled
  program).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from acestep_tpu.config import Qwen3Config
from acestep_tpu.models import qwen3

NEG = jnp.finfo(jnp.float32).min


def cfg_combine(cond: jax.Array, uncond: jax.Array, scale: float) -> jax.Array:
    return (
        uncond.astype(jnp.float32) + scale * (cond.astype(jnp.float32) - uncond.astype(jnp.float32))
    )


def _filter_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep the top one)
    cutoff_mask = cum - probs < top_p
    min_keep = jnp.sum(cutoff_mask, axis=-1, keepdims=True).clip(min=1)
    threshold = jnp.take_along_axis(sorted_logits, min_keep - 1, axis=-1)
    return jnp.where(logits < threshold, NEG, logits)


# Nucleus sampling over a big vocab sorts (B, V) every token — ~1.7 ms/step of
# the LM decode loop at V=152k. Prefilter to the top-K candidates instead:
# lax.top_k returns them already sorted, so top-p needs no sort at all. K=512
# covers any realistic 0.9-nucleus; exact full-vocab path kept for small V.
_NUCLEUS_PREFILTER_K = 512


@functools.partial(jax.jit, static_argnames=("top_k", "top_p"))
def sample(
    logits: jax.Array,  # (B, V) float32
    key: jax.Array,
    temperature: float = 1.0,
    *,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1)
    t = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    scaled = logits / t

    k_eff = top_k if top_k > 0 else (
        _NUCLEUS_PREFILTER_K if (top_p < 1.0 and v > 2048) else 0
    )
    if k_eff and k_eff < v:
        vals, idx = jax.lax.top_k(scaled, k_eff)  # sorted descending
        if top_p < 1.0:
            if top_k > 0:
                # user-requested top-k: renormalize inside the k set (HF warper
                # chain semantics: top-k filter, then top-p over the survivors)
                probs = jax.nn.softmax(vals, axis=-1)
            else:
                # perf-only prefilter: the cumulative cutoff must match the
                # exact full-vocab nucleus, so normalize candidate probs by the
                # full-vocab logsumexp; K-truncation stays the only approximation
                lse = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)
                probs = jnp.exp(vals - lse)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs < top_p).at[..., 0].set(True)
            vals = jnp.where(keep, vals, NEG)
        choice = jax.random.categorical(key, vals, axis=-1)
        sampled = jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]
    else:
        scaled = _filter_top_p(scaled, top_p)
        sampled = jax.random.categorical(key, scaled, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled)


@functools.partial(jax.jit, static_argnames=("top_k", "top_p"))
def sample_allow(
    logits: jax.Array,  # (B, V)
    allow_ids: jax.Array,  # (B, A) int32, padded with -1
    key: jax.Array,
    temperature: float = 1.0,
    *,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """Sample among a small allowed set: gather → sample → scatter back."""
    safe_ids = jnp.maximum(allow_ids, 0)
    sub = jnp.take_along_axis(logits.astype(jnp.float32), safe_ids, axis=-1)
    sub = jnp.where(allow_ids >= 0, sub, NEG)
    idx = sample(sub, key, temperature, top_k=top_k, top_p=top_p)
    return jnp.take_along_axis(safe_ids, idx[:, None], axis=-1)[:, 0]


@functools.partial(jax.jit, static_argnames=("top_k", "top_p"))
def sample_block(
    logits: jax.Array,  # (B, V)
    block_ids: jax.Array,  # (B, A) int32, padded with -1
    key: jax.Array,
    temperature: float = 1.0,
    *,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    b, v = logits.shape
    safe_ids = jnp.where(block_ids >= 0, block_ids, v - 1)
    penalty = jnp.where(block_ids >= 0, NEG, 0.0)
    row = jnp.zeros_like(logits)
    row = jax.vmap(lambda r, i, p: r.at[i].add(p))(row, safe_ids, penalty)
    return sample(logits + row, key, temperature, top_k=top_k, top_p=top_p)


@functools.partial(jax.jit, static_argnames=("newline_token", "eos_token", "top_k", "top_p"))
def sample_prob_end(
    logits: jax.Array,  # (B, V)
    key: jax.Array,
    temperature: jax.Array,
    *,
    newline_token: int,
    eos_token: int,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """Free-text sampling with probability-gated newline ending (ref
    `_should_end_text_field`, constrained_logits_processor.py:1495-1513):
    force newline when P(newline) > max P(other); otherwise sample
    unconstrained (EOS excluded)."""
    lg = logits.astype(jnp.float32)
    probs = jax.nn.softmax(lg, axis=-1)
    nl_p = probs[:, newline_token]
    other_max = jnp.max(probs.at[:, newline_token].set(0.0), axis=-1)
    lg = lg.at[:, eos_token].set(NEG)
    tok = sample(lg, key, temperature, top_k=top_k, top_p=top_p)
    return jnp.where(nl_p > other_max, newline_token, tok).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps", "top_k", "top_p"))
def generate_free(
    params,
    cfg: Qwen3Config,
    logits0: jax.Array,  # (B, V) from prefill
    positions: jax.Array,  # (B,)
    cache: qwen3.KVCache,
    key: jax.Array,
    temperature: jax.Array,  # () float32
    *,
    max_steps: int,
    eos_token: int,
    top_k: int = 0,
    top_p: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Unconstrained decode-until-EOS as one on-device while_loop (used by the
    understand/create_sample/format_sample APIs; replaces a per-token host
    loop). Returns (tokens (B, max_steps) EOS-padded, n_steps)."""
    b = logits0.shape[0]
    out0 = jnp.full((b, max_steps), eos_token, jnp.int32)
    done0 = jnp.zeros((b,), bool)

    def cond(carry):
        i, done, *_ = carry
        return (i < max_steps) & ~jnp.all(done)

    def body(carry):
        i, done, logits, pos, cache, out, key = carry
        key, sub = jax.random.split(key)
        tok = sample(logits.astype(jnp.float32), sub, temperature, top_k=top_k, top_p=top_p)
        tok = jnp.where(done, eos_token, tok).astype(jnp.int32)
        done = done | (tok == eos_token)
        out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, i))
        logits, cache = qwen3.decode_step(params, cfg, tok, pos, cache)
        return (i + 1, done, logits, pos + 1, cache, out, key)

    i, _, _, _, _, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), done0, logits0, positions, cache, out0, key)
    )
    return out, i


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "top_k", "top_p", "cfg_scale",
                     "newline_token", "repetition_penalty"),
)
def generate_cot_dfa(
    params,
    cfg: Qwen3Config,
    logits0: jax.Array,  # (R, V) from prefill (R = B, or 2B with CFG)
    positions: jax.Array,  # (R,)
    cache: qwen3.KVCache,
    key: jax.Array,
    # --- DFA tables (device arrays; see acestep_tpu.lm.dfa.CotDFA) ---
    trans: jax.Array,  # (S, A+1) int32
    alpha_allow: jax.Array,  # (S, A) bool
    allow_other: jax.Array,  # (S,) bool
    finished: jax.Array,  # (S,) bool
    prob_end: jax.Array,  # (S,) bool
    alpha_tokens: jax.Array,  # (A,) int32
    vocab_to_sym: jax.Array,  # (V,) int32
    start_states: jax.Array,  # (B,) int32
    temperature: jax.Array,  # () float32 — traced to avoid recompiles
    seen0: Optional[jax.Array] = None,  # (B, V) bool — prompt tokens, for rep penalty
    *,
    max_steps: int,
    eos_token: int,
    newline_token: int = -1,
    top_k: int = 0,
    top_p: float = 1.0,
    cfg_scale: float = 1.0,
    repetition_penalty: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """The ENTIRE constrained CoT phase as one on-device while_loop.

    Replaces the host-driven FSM loop (one 30 ms-RTT readback per token through
    a remote device link; ref masks logits on host each step,
    `constrained_logits_processor.py:1568`) with DFA table lookups: per step
    the state row gathers an allow-mask, biased logits are sampled, and
    `trans[state, sym(token)]` advances. Exits as soon as every row reaches a
    terminal state. Returns (tokens (B, max_steps) — EOS-padded, n_steps).
    """
    r = logits0.shape[0]
    use_cfg = cfg_scale > 1.0
    b = r // 2 if use_cfg else r
    v = logits0.shape[1]
    use_rp = repetition_penalty != 1.0

    out0 = jnp.full((b, max_steps), eos_token, jnp.int32)
    seen_init = (
        (seen0 if seen0 is not None else jnp.zeros((b, v), bool))
        if use_rp else jnp.zeros((b, 1), bool)
    )

    def cond(carry):
        i, states, *_ = carry
        return (i < max_steps) & jnp.any(~finished[states])

    def body(carry):
        i, states, logits, pos, cache, out, key, seen = carry
        lg = logits.astype(jnp.float32)
        if use_cfg:
            lg = cfg_combine(lg[:b], lg[b:], cfg_scale)
        if use_rp:
            # HF RepetitionPenaltyLogitsProcessor semantics over prompt+generated.
            lg = jnp.where(
                seen, jnp.where(lg > 0, lg / repetition_penalty, lg * repetition_penalty), lg
            )
        done = finished[states]  # (B,)
        # Build the (B, V) mask from the state rows: non-alphabet tokens via
        # allow_other, alphabet tokens via a scatter of the (B, A) allow row.
        base = jnp.where(allow_other[states][:, None], 0.0, NEG)
        bias = jnp.broadcast_to(base, (b, v))
        abias = jnp.where(alpha_allow[states], 0.0, NEG)  # (B, A)
        bias = bias.at[:, alpha_tokens].set(abias)
        key, sub = jax.random.split(key)
        tok = sample(lg + bias, sub, temperature, top_k=top_k, top_p=top_p)
        if newline_token >= 0:
            # Probability-gated field ending (ref _should_end_text_field
            # :1495-1513): in prob_end states force newline when P(newline)
            # exceeds every other token's probability (computed on the
            # UNconstrained logits, as the reference does).
            probs = jax.nn.softmax(lg, axis=-1)
            nl_p = probs[:, newline_token]
            other_max = jnp.max(probs.at[:, newline_token].set(0.0), axis=-1)
            force_nl = prob_end[states] & (nl_p > other_max)
            tok = jnp.where(force_nl, newline_token, tok)
        tok = jnp.where(done, eos_token, tok).astype(jnp.int32)
        states = jnp.where(done, states, trans[states, vocab_to_sym[tok]])
        out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, i))
        if use_rp:
            seen = seen.at[jnp.arange(b), tok].set(True)
        feed = jnp.concatenate([tok, tok]) if use_cfg else tok
        logits, cache = qwen3.decode_step(params, cfg, feed, pos, cache)
        return (i + 1, states, logits, pos + 1, cache, out, key, seen)

    i, _, _, _, _, out, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), start_states, logits0, positions, cache, out0, key, seen_init)
    )
    return out, i


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "code_start", "n_codes", "top_k", "top_p",
                     "cfg_scale", "repetition_penalty"),
)
def generate_codes_scan(
    params,
    cfg: Qwen3Config,
    first_tokens: jax.Array,  # (R,) tokens to feed first (R = B or 2B w/ CFG)
    positions: jax.Array,  # (R,) their positions
    cache: qwen3.KVCache,
    key: jax.Array,
    seen0: Optional[jax.Array] = None,  # (B, n_codes) bool — codes already in the prompt
    *,
    n_steps: int,
    code_start: int,
    n_codes: int,
    temperature: float = 0.85,
    top_k: int = 0,
    top_p: float = 0.9,
    cfg_scale: float = 1.0,
    repetition_penalty: float = 1.0,
) -> Tuple[jax.Array, qwen3.KVCache]:
    """Generate `n_steps` audio-code tokens fully on device.

    With cfg_scale > 1, rows are [cond(B), uncond(B)] in one decode batch —
    the lockstep CFG decode of ref `_generate_with_cfg_custom` (:2414-2533) —
    and sampled tokens are fed to both halves. repetition_penalty != 1 applies
    HF semantics over the code sub-vocabulary (prompt codes via seen0 +
    generated codes).
    """
    r = first_tokens.shape[0]
    use_cfg = cfg_scale > 1.0
    b = r // 2 if use_cfg else r
    use_rp = repetition_penalty != 1.0
    seen_init = (
        (seen0 if seen0 is not None else jnp.zeros((b, n_codes), bool))
        if use_rp else jnp.zeros((b, 1), bool)
    )

    def step(carry, k):
        toks, pos, cache, seen = carry
        logits, cache = qwen3.decode_step(params, cfg, toks, pos, cache)
        code_logits = jax.lax.dynamic_slice_in_dim(logits, code_start, n_codes, axis=-1)
        if use_cfg:
            code_logits = cfg_combine(code_logits[:b], code_logits[b:], cfg_scale)
        if use_rp:
            code_logits = jnp.where(
                seen,
                jnp.where(code_logits > 0, code_logits / repetition_penalty,
                          code_logits * repetition_penalty),
                code_logits,
            )
        idx = sample(code_logits, k, temperature, top_k=top_k, top_p=top_p)
        if use_rp:
            seen = seen.at[jnp.arange(b), idx].set(True)
        new_tok = (idx + code_start).astype(toks.dtype)
        if use_cfg:
            new_tok = jnp.concatenate([new_tok, new_tok])
        return (new_tok, pos + 1, cache, seen), idx + code_start

    keys = jax.random.split(key, n_steps)
    (final_tok, _, cache, _), toks = jax.lax.scan(
        step, (first_tokens, positions, cache, seen_init), keys
    )
    return toks.T, cache  # (B or 2B? -> (R?...)) tokens per step transposed to (R, n_steps)
