"""LLMHandler — lifecycle + two-phase constrained generation for the 5 Hz LM.

TPU-native replacement for the reference's `LLMHandler`
(`acestep/llm_inference.py:46`, generation :1123-1485, prompt builders
:1487-1620, parse :2535) and its nano-vllm engine. Architecture:

- Phase 1 (CoT metadata): host-driven decode loop. Forced-string tokens are
  pushed without logits readback; FSM decision points sample on device via
  ALLOW/BLOCK gathers (`acestep_tpu.lm.sampling`) and read back one token id.
- Phase 2 (audio codes): one `lax.scan` generates the full duration-driven
  token budget (5 codes/s) on device, with lockstep logit-space CFG.
- KV cache: preallocated HBM buffers, bucketed prompt lengths.
"""

from __future__ import annotations

import os
import re
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import Qwen3Config
from acestep_tpu.lm.constrained import ConstrainedDecoderFSM, StepSpec
from acestep_tpu.lm import sampling
from acestep_tpu.models import qwen3
from acestep_tpu.utils.constants import (
    DEFAULT_LM_INSTRUCTION,
    DEFAULT_LM_INSPIRED_INSTRUCTION,
    DEFAULT_LM_REWRITE_INSTRUCTION,
    DEFAULT_LM_UNDERSTAND_INSTRUCTION,
)
from acestep_tpu.utils import debug
from acestep_tpu.utils.tokenizer import load_tokenizer, pick_bucket

PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096)

# Qwen3 model-size presets (reference model zoo acestep-5Hz-lm-{0.6B,1.7B,4B}).
LM_CONFIGS = {
    "0.6B": Qwen3Config(hidden_size=1024, intermediate_size=3072, num_hidden_layers=28,
                        num_attention_heads=16, num_key_value_heads=8),
    "1.7B": Qwen3Config(hidden_size=2048, intermediate_size=6144, num_hidden_layers=28,
                        num_attention_heads=16, num_key_value_heads=8),
    "4B": Qwen3Config(hidden_size=2560, intermediate_size=9728, num_hidden_layers=36,
                      num_attention_heads=32, num_key_value_heads=8),
}

CODE_RE = re.compile(r"<\|audio_code_(\d+)\|>")


def _has_meaningful_negative_prompt(p: Optional[str]) -> bool:
    return bool(p) and p.strip() not in ("", "NO USER INPUT")


class LLMHandler:
    """5 Hz planner LM: CoT metadata + audio-code generation."""

    def __init__(self, config: Optional[Qwen3Config] = None, dtype=jnp.bfloat16):
        self.config = config or LM_CONFIGS["0.6B"]
        self.dtype = dtype
        self.params = None
        self.tokenizer = None
        self.fsm: Optional[ConstrainedDecoderFSM] = None
        self.initialized = False
        self.max_model_len = 4096

    # ------------------------------------------------------------------

    def initialize(
        self,
        checkpoint_dir: Optional[str] = None,
        *,
        random_init: Optional[bool] = None,
        max_duration: Optional[int] = None,
        seed: int = 0,
    ) -> str:
        t0 = time.time()
        if random_init is None:
            random_init = checkpoint_dir is None or not os.path.isdir(checkpoint_dir)
        if random_init:
            self.tokenizer = load_tokenizer(None)
            self.params = qwen3.init_qwen3_params(jax.random.PRNGKey(seed), self.config, self.dtype)
        else:
            import json

            from acestep_tpu.models.qwen3 import convert_torch_qwen3_state
            from acestep_tpu.params import load_safetensors_state

            with open(os.path.join(checkpoint_dir, "config.json")) as f:
                raw = json.load(f)
            self.config = Qwen3Config(
                vocab_size=raw["vocab_size"],
                hidden_size=raw["hidden_size"],
                intermediate_size=raw["intermediate_size"],
                num_hidden_layers=raw["num_hidden_layers"],
                num_attention_heads=raw["num_attention_heads"],
                num_key_value_heads=raw["num_key_value_heads"],
                head_dim=raw.get("head_dim", 128),
                rope_theta=raw.get("rope_theta", 1e6),
                tie_word_embeddings=raw.get("tie_word_embeddings", True),
            )
            state = load_safetensors_state(checkpoint_dir)
            if not state:
                raise FileNotFoundError(
                    f"LM checkpoint at {checkpoint_dir!r} has no *.safetensors "
                    "weights; re-download it or pass random_init=True"
                )
            self.params = convert_torch_qwen3_state(state, self.config, self.dtype)
            self.tokenizer = load_tokenizer(checkpoint_dir)

        genres_vocab = None
        if checkpoint_dir:
            gpath = os.path.join(checkpoint_dir, "genres_vocab.txt")
            if os.path.exists(gpath):
                with open(gpath) as f:
                    genres_vocab = [l.strip() for l in f if l.strip()]
        self.genres_vocab = genres_vocab
        self.fsm = ConstrainedDecoderFSM(self.tokenizer, max_duration=max_duration,
                                         genres_vocab=genres_vocab)
        # Fresh per-initialization: entries are tied to these weights.
        from acestep_tpu.lm.prefix_cache import PrefillCache

        self.prefill_cache = PrefillCache()
        # DFA tables are tied to this tokenizer/vocab/genres/max_duration.
        self._dfa_cache = {}
        self.initialized = True
        return f"LM initialized in {time.time() - t0:.1f}s (random_init={random_init})"

    # ------------------------------------------------------------------
    # Prompt building (ref llm_inference.py:1487-1620)
    # ------------------------------------------------------------------

    def _apply_chat_template(self, messages: List[Dict[str, str]], add_generation_prompt: bool) -> str:
        tok = self.tokenizer
        if hasattr(tok, "apply_chat_template"):
            try:
                return tok.apply_chat_template(
                    messages, tokenize=False, add_generation_prompt=add_generation_prompt
                )
            except Exception:
                pass
        out = []
        for m in messages:
            out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        if add_generation_prompt:
            out.append("<|im_start|>assistant\n")
        return "".join(out)

    def build_formatted_prompt(
        self,
        caption: str,
        lyrics: str = "",
        is_negative_prompt: bool = False,
        generation_phase: str = "cot",
        negative_prompt: str = "NO USER INPUT",
    ) -> str:
        if is_negative_prompt:
            if generation_phase == "cot":
                if _has_meaningful_negative_prompt(negative_prompt):
                    prompt = f"# Caption\n{negative_prompt}\n\n# Lyric\n{lyrics}\n"
                else:
                    prompt = f"# Lyric\n{lyrics}\n"
            else:
                prompt = caption
        else:
            prompt = f"# Caption\n{caption}\n\n# Lyric\n{lyrics}\n"
        return self._apply_chat_template(
            [
                {"role": "system", "content": f"# Instruction\n{DEFAULT_LM_INSTRUCTION}\n\n"},
                {"role": "user", "content": prompt},
            ],
            add_generation_prompt=True,
        )

    def build_formatted_prompt_with_cot(
        self,
        caption: str,
        lyrics: str,
        cot_text: str,
        is_negative_prompt: bool = False,
        negative_prompt: str = "NO USER INPUT",
    ) -> str:
        if is_negative_prompt:
            cot_for_prompt = "<think>\n</think>"
            caption_for_prompt = (
                negative_prompt if _has_meaningful_negative_prompt(negative_prompt) else caption
            )
        else:
            cot_for_prompt = cot_text
            caption_for_prompt = caption
        user_prompt = f"# Caption\n{caption_for_prompt}\n\n# Lyric\n{lyrics}\n"
        formatted = self._apply_chat_template(
            [
                {"role": "system", "content": f"# Instruction\n{DEFAULT_LM_INSTRUCTION}\n\n"},
                {"role": "user", "content": user_prompt},
                {"role": "assistant", "content": cot_for_prompt},
            ],
            add_generation_prompt=False,
        )
        if not formatted.endswith("\n"):
            formatted += "\n"
        return formatted

    def build_formatted_prompt_for_understanding(
        self, audio_codes: str, is_negative_prompt: bool = False, negative_prompt: str = "NO USER INPUT"
    ) -> str:
        if is_negative_prompt:
            user = negative_prompt if _has_meaningful_negative_prompt(negative_prompt) else ""
        else:
            user = audio_codes
        return self._apply_chat_template(
            [
                {"role": "system", "content": f"# Instruction\n{DEFAULT_LM_UNDERSTAND_INSTRUCTION}\n\n"},
                {"role": "user", "content": user},
            ],
            add_generation_prompt=True,
        )

    # ------------------------------------------------------------------
    # Core decode machinery
    # ------------------------------------------------------------------

    def _encode_prompts(self, prompts: List[str], budget: int) -> Tuple[np.ndarray, np.ndarray, int]:
        from acestep_tpu.utils.tokenizer import tokenize_padded

        max_prompt = self.max_model_len - budget
        ids, mask = tokenize_padded(
            self.tokenizer, prompts, max_prompt, buckets=PROMPT_BUCKETS
        )
        return ids, mask, ids.shape[1]

    def enable_tensor_parallel(self, mesh=None) -> None:
        """Shard LM weights over the mesh's 'tp' axis (colwise q/k/v/gate/up,
        rowwise o/down — the plan nano-vllm applies with NCCL; here XLA
        inserts the ICI all-reduces from the shardings)."""
        from acestep_tpu.parallel.mesh import make_mesh, shard_params_tp

        self.mesh = mesh if mesh is not None else make_mesh(tp=len(jax.devices()))
        self.params = shard_params_tp(self.mesh, self.params)
        if getattr(self, "prefill_cache", None) is not None:
            self.prefill_cache.clear()  # entries hold unsharded KV rows

    def _prefill(self, ids: np.ndarray, mask: np.ndarray, total_len: int):
        """Prefill via the dedup/prefix cache (nano-vllm prefix-cache parity);
        falls back to a plain batched prefill when disabled."""
        from acestep_tpu.lm import prefix_cache

        if prefix_cache.enabled() and getattr(self, "prefill_cache", None) is not None:
            return self.prefill_cache.prefill(
                self.params, self.config, np.asarray(ids), np.asarray(mask),
                total_len, self.dtype,
            )
        cache = qwen3.KVCache.create(self.config, ids.shape[0], total_len, self.dtype)
        return qwen3.prefill(
            self.params, self.config, jnp.asarray(ids), jnp.asarray(mask), cache
        )

    def _constrained_loop(
        self,
        fsms: List[ConstrainedDecoderFSM],
        logits: jax.Array,  # (R, V) from prefill
        cache: qwen3.KVCache,
        positions: np.ndarray,  # (R,)
        *,
        max_new_tokens: int,
        temperature: float,
        top_k: int,
        top_p: float,
        cfg_scale: float = 1.0,
        key: Optional[jax.Array] = None,
    ) -> Tuple[List[List[int]], jax.Array, qwen3.KVCache, np.ndarray]:
        """Host-driven FSM loop (phase-1 CoT / understand grammar).

        Per-row StepSpecs are grouped by kind: ALLOW sets gather-sample at a
        bucketed width (96/256/1024/4096 — no truncation, no silent forcing),
        BLOCK/FREE rows scatter-mask, PROB_END rows use the probability-gated
        newline ending. Returns per-seq generated ids.
        """
        ALLOW_BUCKETS = (96, 256, 1024, 4096)
        b = len(fsms)
        r = logits.shape[0]
        use_cfg = cfg_scale > 1.0 and r == 2 * b
        key = key if key is not None else jax.random.PRNGKey(0)
        generated: List[List[int]] = [[] for _ in range(b)]
        positions = positions.copy()

        for step in range(max_new_tokens):
            if all(f.finished for f in fsms):
                break
            specs = [f.step_spec() for f in fsms]

            if all(s.kind in ("force", "eos") for s in specs):
                toks = np.asarray([s.token for s in specs], np.int32)
            else:
                lg = logits
                if use_cfg:
                    lg = sampling.cfg_combine(logits[:b], logits[b:], cfg_scale)
                toks = np.full((b,), -1, np.int32)
                allow_rows = [i for i, s in enumerate(specs) if s.kind == "allow"]
                block_rows = [i for i, s in enumerate(specs) if s.kind in ("block", "free")]
                prob_rows = [i for i, s in enumerate(specs) if s.kind == "prob_end"]
                for i, s in enumerate(specs):
                    if s.kind in ("force", "eos"):
                        toks[i] = s.token
                if allow_rows:
                    longest = max(len(specs[i].ids) for i in allow_rows)
                    width = next((w for w in ALLOW_BUCKETS if w >= longest), longest)
                    ids = np.full((b, width), -1, np.int32)
                    for i in allow_rows:
                        ids[i, : len(specs[i].ids)] = specs[i].ids[:width]
                    key, sub = jax.random.split(key)
                    got = np.asarray(sampling.sample_allow(
                        lg, jnp.asarray(ids), sub, temperature, top_k=top_k, top_p=top_p))
                    toks[allow_rows] = got[allow_rows]
                if block_rows:
                    width = max(
                        (len(specs[i].ids) for i in block_rows if specs[i].ids), default=1
                    )
                    ids = np.full((b, max(width, 1)), -1, np.int32)
                    for i in block_rows:
                        if specs[i].ids:
                            ids[i, : len(specs[i].ids)] = specs[i].ids
                    key, sub = jax.random.split(key)
                    got = np.asarray(sampling.sample_block(
                        lg, jnp.asarray(ids), sub, temperature, top_k=top_k, top_p=top_p))
                    toks[block_rows] = got[block_rows]
                if prob_rows:
                    key, sub = jax.random.split(key)
                    got = np.asarray(sampling.sample_prob_end(
                        lg, sub, jnp.float32(temperature),
                        newline_token=specs[prob_rows[0]].token,
                        eos_token=self.fsm.eos_token_id, top_k=top_k, top_p=top_p))
                    toks[prob_rows] = got[prob_rows]

            for i, f in enumerate(fsms):
                if not f.finished:
                    f.advance(int(toks[i]))
                    generated[i].append(int(toks[i]))

            feed = np.concatenate([toks, toks]) if use_cfg else toks
            logits, cache = qwen3.decode_step(
                self.params, self.config, jnp.asarray(feed), jnp.asarray(positions), cache
            )
            positions = positions + 1

        return generated, logits, cache, positions

    # ------------------------------------------------------------------
    # Device-side DFA path (acestep_tpu.lm.dfa)
    # ------------------------------------------------------------------

    # Largest DFA worth shipping to the device: S·(A+1) int32 transition
    # entries (64 MB at this cap). A multi-thousand-entry genres vocabulary
    # can push the dense tables past this — those requests use the host loop.
    _DFA_MAX_TABLE_ENTRIES = 16_000_000

    def _cot_dfa_for(self, user_metadata, max_cot_tokens: int,
                     target_duration: Optional[float] = None,
                     phase: str = "cot", skip_genres: bool = True):
        """Compile (and cache) the CoT/understand grammar → device DFA tables.

        The main generate grammar skips genres like the reference
        (llm_inference.py:1233); understand/create/format grammars pass
        skip_genres=False (ref :1715/:1924/:2125) — genres uses the vocab trie
        when loaded, else the probability-ended free-text fallback. Returns
        None when the grammar's dense tables would be too large for the device
        path (caller falls back to the host FSM loop)."""
        from acestep_tpu.lm.dfa import compile_cot_dfa

        md = tuple(sorted((k, str(v)) for k, v in (user_metadata or {}).items()
                          if v not in (None, "", "N/A")))
        key = (md, max_cot_tokens, self.genres_vocab is not None, target_duration,
               phase, skip_genres)
        cache = getattr(self, "_dfa_cache", None)
        if cache is None:
            cache = self._dfa_cache = {}
        if key in cache:
            return cache[key]
        fsm = ConstrainedDecoderFSM(
            self.tokenizer, max_duration=self.fsm.max_duration,
            genres_vocab=self.genres_vocab, skip_genres=skip_genres,
            caption_max_tokens=min(512, max_cot_tokens // 3),
        )
        # target_duration reaches the FSM exactly as on the host-loop path, so
        # the two paths stay grammar-identical if duration ever constrains CoT.
        fsm.reset(phase=phase, stop_at_reasoning=phase == "cot",
                  user_metadata=user_metadata, target_duration=target_duration)
        dfa = compile_cot_dfa(fsm, self.config.vocab_size)
        if dfa.trans.size > self._DFA_MAX_TABLE_ENTRIES:
            cache[key] = None
            return None
        dev = {
            "trans": jnp.asarray(dfa.trans),
            "alpha_allow": jnp.asarray(dfa.alpha_allow),
            "allow_other": jnp.asarray(dfa.allow_other),
            "finished": jnp.asarray(dfa.finished),
            "prob_end": jnp.asarray(dfa.prob_end),
            "alpha_tokens": jnp.asarray(dfa.alpha_tokens),
            "vocab_to_sym": jnp.asarray(dfa.vocab_to_sym),
        }
        if len(cache) >= 8:
            cache.pop(next(iter(cache)))
        cache[key] = (dfa, dev)
        return cache[key]

    def _cot_device_generate(
        self,
        b: int,
        logits: jax.Array,
        cache: qwen3.KVCache,
        positions: np.ndarray,
        *,
        user_metadata,
        max_cot_tokens: int,
        temperature: float,
        top_k: int,
        top_p: float,
        cfg_scale: float,
        seed: int,
        target_duration: Optional[float] = None,
        repetition_penalty: float = 1.0,
    ) -> Optional[List[List[int]]]:
        """Run the whole CoT phase on device; one readback at the end.
        Returns None when the grammar is too large for the device DFA."""
        compiled = self._cot_dfa_for(user_metadata, max_cot_tokens, target_duration)
        if compiled is None:
            return None
        dfa, dev = compiled
        toks, _ = sampling.generate_cot_dfa(
            self.params, self.config, logits, jnp.asarray(positions), cache,
            jax.random.PRNGKey(seed), dev["trans"], dev["alpha_allow"],
            dev["allow_other"], dev["finished"], dev["prob_end"],
            dev["alpha_tokens"], dev["vocab_to_sym"],
            jnp.full((b,), dfa.start_state, jnp.int32),
            jnp.float32(temperature),
            max_steps=max_cot_tokens, eos_token=dfa.eos_token_id,
            newline_token=dfa.newline_token_id if bool(dfa.prob_end.any()) else -1,
            top_k=top_k, top_p=top_p, cfg_scale=cfg_scale if cfg_scale > 1.0 else 1.0,
            repetition_penalty=repetition_penalty,
        )
        toks = np.asarray(toks)
        out: List[List[int]] = []
        for row in toks:
            ids = []
            for t in row:
                if int(t) == dfa.eos_token_id:
                    break
                ids.append(int(t))
            out.append(ids)
        return out

    # ------------------------------------------------------------------
    # Public generation API (ref generate_with_stop_condition :1123-1485)
    # ------------------------------------------------------------------

    def generate_with_stop_condition(
        self,
        caption: str,
        lyrics: str = "",
        *,
        temperature: float = 0.85,
        cfg_scale: float = 1.0,
        top_k: int = 0,
        top_p: float = 0.9,
        repetition_penalty: float = 1.0,
        negative_prompt: str = "NO USER INPUT",
        user_metadata: Optional[Dict[str, Optional[str]]] = None,
        target_duration: Optional[float] = None,
        stop_at_reasoning: bool = False,
        use_constrained_decoding: bool = True,
        max_cot_tokens: int = 350,
        seed: int = 0,
        batch_size: int = 1,
        batch_chunk_size: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Two-phase generation: CoT metadata, then duration-driven audio codes.

        batch_size > 1 generates a DISTINCT plan (CoT + codes) per batch item
        in lockstep batched decoding; batch_chunk_size bounds the decode batch
        (ref LM batch chunking, llm_inference.py:1123-1485) — larger requests
        run as sequential chunks and results are concatenated. Returns the
        first sample's fields plus per-sample lists under
        "batch_metadata"/"batch_audio_codes".
        """
        assert self.initialized, "call initialize() first"
        if batch_chunk_size and batch_size > batch_chunk_size:
            merged: Dict[str, Any] = {}
            done = 0
            while done < batch_size:
                n = min(batch_chunk_size, batch_size - done)
                part = self.generate_with_stop_condition(
                    caption, lyrics, temperature=temperature, cfg_scale=cfg_scale,
                    top_k=top_k, top_p=top_p, repetition_penalty=repetition_penalty,
                    negative_prompt=negative_prompt, user_metadata=user_metadata,
                    target_duration=target_duration, stop_at_reasoning=stop_at_reasoning,
                    use_constrained_decoding=use_constrained_decoding,
                    max_cot_tokens=max_cot_tokens, seed=seed + done, batch_size=n,
                )
                if not merged:
                    merged = part
                else:
                    for k in ("batch_metadata", "batch_cot_texts", "batch_audio_codes",
                              "batch_codes"):
                        if k in part:
                            merged.setdefault(k, []).extend(part[k])
                    for k, v in part.get("time_costs", {}).items():
                        merged["time_costs"][k] = merged["time_costs"].get(k, 0.0) + v
                done += n
            return merged
        t0 = time.time()
        time_costs: Dict[str, float] = {}
        b = max(1, batch_size)

        # ---------------- Phase 1: CoT ----------------
        cond_prompt = self.build_formatted_prompt(caption, lyrics, generation_phase="cot")
        prompts = [cond_prompt] * b
        use_cfg = cfg_scale > 1.0
        if use_cfg:
            prompts = prompts + [
                self.build_formatted_prompt(
                    caption, lyrics, is_negative_prompt=True,
                    generation_phase="cot", negative_prompt=negative_prompt,
                )
            ] * b
        ids, mask, bucket = self._encode_prompts(prompts, budget=max_cot_tokens)
        r = ids.shape[0]
        logits, cache = self._prefill(ids, mask, bucket + max_cot_tokens)

        positions = np.asarray([mask[i].sum() for i in range(r)], np.int32)
        use_device_fsm = (
            use_constrained_decoding
            and os.environ.get("ACESTEP_TPU_NO_DEVICE_FSM", "0") != "1"
        )
        generated = None
        if use_device_fsm:
            # Whole CoT phase as one on-device DFA loop — no per-token host RTT.
            generated = self._cot_device_generate(
                b, logits, cache, positions,
                user_metadata=user_metadata, max_cot_tokens=max_cot_tokens,
                temperature=temperature, top_k=top_k, top_p=top_p,
                cfg_scale=cfg_scale, seed=seed, target_duration=target_duration,
                repetition_penalty=repetition_penalty,
            )
        if generated is None:
            fsms = []
            for i in range(b):
                # skip_genres=True ALWAYS: main-generation CoT never emits a
                # genres line (ref llm_inference.py:1233), regardless of
                # whether a genres vocab is loaded — the device-DFA path and
                # this host fallback must enforce the same grammar.
                fsm = ConstrainedDecoderFSM(self.tokenizer, enabled=use_constrained_decoding,
                                            max_duration=self.fsm.max_duration,
                                            genres_vocab=self.genres_vocab,
                                            skip_genres=True,
                                            caption_max_tokens=min(512, max_cot_tokens // 3))
                fsm.reset(phase="cot", stop_at_reasoning=True, user_metadata=user_metadata,
                          target_duration=target_duration)
                fsms.append(fsm)
            generated, _, _, _ = self._constrained_loop(
                fsms, logits, cache, positions,
                max_new_tokens=max_cot_tokens, temperature=temperature,
                top_k=top_k, top_p=top_p, cfg_scale=cfg_scale,
                key=jax.random.PRNGKey(seed),
            )
        cot_texts = [self.tokenizer.decode(g) for g in generated]
        time_costs["lm_cot_time_cost"] = time.time() - t0
        metadatas = [self.parse_lm_output(t)[0] for t in cot_texts]

        if stop_at_reasoning:
            time_costs["lm_total_time_cost"] = time.time() - t0
            return {"metadata": metadatas[0], "cot_text": cot_texts[0], "audio_codes": "",
                    "batch_metadata": metadatas, "batch_cot_texts": cot_texts,
                    "time_costs": time_costs}

        # ---------------- Phase 2: codes ----------------
        t1 = time.time()
        durations = []
        for md in metadatas:
            duration = target_duration or md.get("duration")
            try:
                duration = float(duration)
            except (TypeError, ValueError):
                duration = 30.0
            durations.append(max(1.0, min(duration, self.fsm.max_duration)))
        n_codes_each = [int(round(d * 5)) for d in durations]
        n_codes_max = max(n_codes_each)

        codes_batch = self._generate_codes(
            caption, lyrics, cot_texts, n_codes_max,
            temperature=temperature, cfg_scale=cfg_scale, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty,
            negative_prompt=negative_prompt, seed=seed,
        )
        codes_batch = [c[: n_codes_each[i]] for i, c in enumerate(codes_batch)]
        audio_codes_batch = [
            "".join(f"<|audio_code_{c}|>" for c in codes) for codes in codes_batch
        ]
        time_costs["lm_codes_time_cost"] = time.time() - t1
        time_costs["lm_total_time_cost"] = time.time() - t0
        debug.log("lm", f"generate b={b} cfg={cfg_scale} "
                  + " ".join(f"{k}={v:.3f}" for k, v in time_costs.items()))
        return {
            "metadata": metadatas[0],
            "cot_text": cot_texts[0],
            "audio_codes": audio_codes_batch[0],
            "codes": codes_batch[0],
            "batch_metadata": metadatas,
            "batch_audio_codes": audio_codes_batch,
            "batch_codes": codes_batch,
            "time_costs": time_costs,
        }

    def _generate_codes(
        self,
        caption: str,
        lyrics: str,
        cot_texts,
        n_codes: int,
        *,
        temperature: float,
        cfg_scale: float,
        top_k: int,
        top_p: float,
        negative_prompt: str,
        seed: int,
        repetition_penalty: float = 1.0,
    ) -> List[List[int]]:
        """Device-scan code generation for a batch of CoT plans. Falls back to
        pseudo-codes when the tokenizer lacks native code tokens (dev mode)."""
        if isinstance(cot_texts, str):
            cot_texts = [cot_texts]
        b = len(cot_texts)
        prompts = [self.build_formatted_prompt_with_cot(caption, lyrics, c) for c in cot_texts]
        use_cfg = cfg_scale > 1.0
        if use_cfg:
            prompts = prompts + [
                self.build_formatted_prompt_with_cot(
                    caption, lyrics, cot_texts[i], is_negative_prompt=True,
                    negative_prompt=negative_prompt,
                )
                for i in range(b)
            ]
        code_start = self.fsm.code_token_start
        n_vocab_codes = self.fsm.num_code_tokens
        if code_start < 0:
            # Dev tokenizer: emit pseudo-codes deterministically — BEFORE any
            # prefill (the device work would be discarded anyway).
            rng = np.random.default_rng(seed)
            return [
                [int(x) for x in rng.integers(0, 64000, size=n_codes)] for _ in range(b)
            ]

        ids, mask, bucket = self._encode_prompts(prompts, budget=n_codes + 8)
        r = ids.shape[0]
        logits, cache = self._prefill(ids, mask, bucket + n_codes + 8)
        positions = np.asarray([mask[i].sum() for i in range(r)], np.int32)
        key = jax.random.PRNGKey(seed + 1)

        # First code from prefill logits.
        key, sub = jax.random.split(key)
        code_logits = logits[:, code_start : code_start + n_vocab_codes]
        if use_cfg:
            code_logits = sampling.cfg_combine(code_logits[:b], code_logits[b:], cfg_scale)

        seen0 = None
        seen_np = None
        if repetition_penalty != 1.0:
            # Seed the penalty set with code tokens already in the prompt
            # (cover/understand contexts), HF full-context semantics — and
            # penalize the FIRST sampled code from that set too, not just
            # the scan's subsequent steps.
            seen_np = np.zeros((b, n_vocab_codes), bool)
            in_range = (ids[:b] >= code_start) & (ids[:b] < code_start + n_vocab_codes)
            rows, cols = np.nonzero(in_range)
            seen_np[rows, ids[:b][rows, cols] - code_start] = True
            prompt_seen = jnp.asarray(seen_np)
            cl = code_logits.astype(jnp.float32)
            code_logits = jnp.where(
                prompt_seen,
                jnp.where(cl > 0, cl / repetition_penalty, cl * repetition_penalty),
                cl,
            )
        first = sampling.sample(code_logits, sub, temperature, top_k=top_k, top_p=top_p)
        first_tok = jnp.asarray(first + code_start, jnp.int32)
        feed = jnp.concatenate([first_tok, first_tok]) if use_cfg else first_tok

        if seen_np is not None:
            first_np = np.asarray(first)
            seen_np[np.arange(b), first_np] = True
            seen0 = jnp.asarray(seen_np)
        toks, _ = sampling.generate_codes_scan(
            self.params, self.config, feed, jnp.asarray(positions), cache, key, seen0,
            n_steps=n_codes - 1, code_start=code_start, n_codes=n_vocab_codes,
            temperature=temperature, top_k=top_k, top_p=top_p,
            cfg_scale=cfg_scale if use_cfg else 1.0,
            repetition_penalty=repetition_penalty,
        )
        toks = np.asarray(toks)  # (b, n_codes-1)
        return [
            [int(first[i])] + [int(t) - code_start for t in toks[i]] for i in range(b)
        ]

    # ------------------------------------------------------------------
    # LM-only task APIs (ref inference.py:779-1253 surface)
    # ------------------------------------------------------------------

    def understand_audio_from_codes(self, audio_codes: str, *, temperature: float = 0.85,
                                    max_new_tokens: int = 512, seed: int = 0) -> Dict[str, Any]:
        """Codes → metadata + lyrics (ref llm_inference.py:1645)."""
        prompt = self.build_formatted_prompt_for_understanding(audio_codes)
        text = self._free_generate(prompt, temperature=temperature,
                                   max_new_tokens=max_new_tokens, seed=seed)
        metadata, _ = self.parse_lm_output(text)
        return {"metadata": metadata, "text": text}

    def create_sample_from_query(self, query: str, *, temperature: float = 0.85,
                                 max_new_tokens: int = 512, seed: int = 0) -> Dict[str, Any]:
        """Query → expanded sample (caption/lyrics) (ref :1837)."""
        prompt = self._apply_chat_template(
            [
                {"role": "system", "content": f"# Instruction\n{DEFAULT_LM_INSPIRED_INSTRUCTION}\n\n"},
                {"role": "user", "content": query},
            ],
            add_generation_prompt=True,
        )
        text = self._free_generate(prompt, temperature=temperature,
                                   max_new_tokens=max_new_tokens, seed=seed)
        metadata, _ = self.parse_lm_output(text)
        return {"metadata": metadata, "text": text}

    def format_sample_from_input(self, user_input: str, *, temperature: float = 0.85,
                                 max_new_tokens: int = 512, seed: int = 0) -> Dict[str, Any]:
        """Free-form input → formatted sample (ref :2011)."""
        prompt = self._apply_chat_template(
            [
                {"role": "system", "content": f"# Instruction\n{DEFAULT_LM_REWRITE_INSTRUCTION}\n\n"},
                {"role": "user", "content": user_input},
            ],
            add_generation_prompt=True,
        )
        text = self._free_generate(prompt, temperature=temperature,
                                   max_new_tokens=max_new_tokens, seed=seed)
        metadata, _ = self.parse_lm_output(text)
        return {"metadata": metadata, "text": text}

    def _free_generate(self, prompt: str, *, temperature: float, max_new_tokens: int,
                       seed: int, constrained: bool = True) -> str:
        """Decode-until-EOS for the understand/create/format APIs, fully on
        device (one readback).

        By default the understand grammar is enforced — constrained metadata
        (INCLUDING genres, ref llm_inference.py:1715/:1924/:2125
        skip_genres=False) then free text until EOS — matching the reference,
        which runs its constrained processor on these phases too. Falls back
        to unconstrained decoding if the grammar cannot compile (dev-mode
        tokenizers without the full special-token set)."""
        ids, mask, bucket = self._encode_prompts([prompt], budget=max_new_tokens)
        logits, cache = self._prefill(ids, mask, bucket + max_new_tokens)
        positions = np.asarray([mask[0].sum()], np.int32)
        eos = getattr(self.tokenizer, "eos_token_id", None) or 2

        compiled = None
        if constrained and os.environ.get("ACESTEP_TPU_NO_DEVICE_FSM", "0") != "1":
            try:
                compiled = self._cot_dfa_for(None, max_new_tokens,
                                             phase="understand", skip_genres=False)
            except Exception:  # pragma: no cover — dev tokenizer quirks
                compiled = None
        if compiled is not None:
            dfa, dev = compiled
            toks, _ = sampling.generate_cot_dfa(
                self.params, self.config, logits, jnp.asarray(positions), cache,
                jax.random.PRNGKey(seed), dev["trans"], dev["alpha_allow"],
                dev["allow_other"], dev["finished"], dev["prob_end"],
                dev["alpha_tokens"], dev["vocab_to_sym"],
                jnp.full((1,), dfa.start_state, jnp.int32),
                jnp.float32(temperature),
                max_steps=max_new_tokens, eos_token=dfa.eos_token_id,
                newline_token=dfa.newline_token_id if bool(dfa.prob_end.any()) else -1,
                top_k=0, top_p=0.9,
            )
        else:
            toks, _ = sampling.generate_free(
                self.params, self.config, logits, jnp.asarray(positions), cache,
                jax.random.PRNGKey(seed), jnp.float32(temperature),
                max_steps=max_new_tokens, eos_token=eos, top_k=0, top_p=0.9,
            )
        row = np.asarray(toks)[0]
        out = []
        for t in row:
            if int(t) == eos:
                break
            out.append(int(t))
        return self.tokenizer.decode(out)

    # ------------------------------------------------------------------
    # Output parsing (ref llm_inference.py:2535-2658)
    # ------------------------------------------------------------------

    @staticmethod
    def parse_lm_output(output_text: str) -> Tuple[Dict[str, Any], str]:
        """Extract metadata dict and audio-code string from LM output."""
        audio_codes = "".join(m.group(0) for m in CODE_RE.finditer(output_text))

        m = re.search(r"<think>(.*?)</think>", output_text, re.DOTALL)
        if m:
            reasoning = m.group(1).strip()
        else:
            reasoning = output_text.split("<|audio_code_")[0].strip()

        metadata: Dict[str, Any] = {}
        current_key: Optional[str] = None
        value_lines: List[str] = []

        def flush():
            nonlocal current_key, value_lines
            if current_key and value_lines:
                value = "\n".join(value_lines)
                if current_key in ("bpm", "duration"):
                    try:
                        metadata[current_key] = int(value.strip())
                    except ValueError:
                        metadata[current_key] = value.strip()
                elif current_key == "caption":
                    lines = [l.strip() for l in value.split("\n") if l.strip()]
                    metadata["caption"] = " ".join(lines)
                elif current_key in ("genres", "keyscale", "language", "timesignature", "lyrics"):
                    metadata[current_key] = value.strip()
            current_key, value_lines = None, []

        for line in reasoning.split("\n"):
            if line.strip().startswith("<"):
                continue
            if line and not line[0].isspace() and ":" in line:
                flush()
                k, v = line.split(":", 1)
                current_key = k.strip().lower()
                if v.strip():
                    value_lines.append(v)
            elif line.startswith((" ", "\t")) and current_key:
                value_lines.append(line)
        flush()
        return metadata, audio_codes
