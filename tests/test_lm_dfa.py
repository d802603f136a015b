"""Device-side CoT DFA: equivalence with the host FSM and end-to-end decode.

The DFA (`acestep_tpu/lm/dfa.py`) compiles the constrained-CoT grammar of
`ConstrainedDecoderFSM` into transition/allow tables executed by
`sampling.generate_cot_dfa` as one on-device loop. These tests pin:
- table semantics ≡ host FSM semantics under random walks,
- greedy (temperature=0) device decode ≡ greedy host `_constrained_loop`,
- user-metadata injection and format validity through the device path.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import Qwen3Config
from acestep_tpu.lm import sampling
from acestep_tpu.lm.constrained import ConstrainedDecoderFSM
from acestep_tpu.lm.dfa import compile_cot_dfa
from acestep_tpu.lm.handler import LLMHandler
from acestep_tpu.utils.tokenizer import ByteFallbackTokenizer

TOK = ByteFallbackTokenizer()
VOCAB = 320  # ≥ tokenizer range; models in these tests use this vocab


def make_fsm(**kw):
    fsm = ConstrainedDecoderFSM(TOK, **kw)
    fsm.reset(phase="cot", stop_at_reasoning=True,
              user_metadata=kw.pop("user_metadata", None) or None)
    return fsm


def fresh(user_metadata=None):
    fsm = ConstrainedDecoderFSM(TOK)
    fsm.reset(phase="cot", stop_at_reasoning=True, user_metadata=user_metadata)
    return fsm


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dfa_matches_fsm_random_walk(seed):
    """Walk the host FSM with random choices; the DFA must stay in lockstep
    with identical allowed sets at every step."""
    fsm = fresh()
    dfa = compile_cot_dfa(fresh(), VOCAB)
    rng = np.random.default_rng(seed)
    state = dfa.start_state
    for _ in range(600):
        if fsm.finished:
            assert dfa.finished[state]
            break
        spec = fsm.step_spec()
        if spec.kind == "force":
            tok = spec.token
            allowed_host = {tok}
        elif spec.kind == "allow":
            tok = int(rng.choice(spec.ids))
            allowed_host = set(spec.ids)
        elif spec.kind == "block":
            blocked = set(spec.ids or [])
            cand = [t for t in (TOK.encode("qz7 ,")) if t not in blocked]
            nl = list(fsm.newline_ids)[0]
            pool = cand + ([nl] if nl not in blocked else [])
            tok = int(rng.choice(pool))
            allowed_host = None  # complement set; checked via DFA flags below
        else:
            pytest.fail(f"unexpected kind {spec.kind}")

        # DFA allowed set must match.
        sym = dfa.vocab_to_sym[tok]
        if allowed_host is not None:
            assert not dfa.allow_other[state]
            dfa_allowed = set(
                int(dfa.alpha_tokens[i]) for i in np.nonzero(dfa.alpha_allow[state])[0]
            )
            assert dfa_allowed == allowed_host
        else:
            assert dfa.allow_other[state]
            for t in spec.ids or []:
                s = dfa.vocab_to_sym[t]
                assert s < dfa.num_symbols and not dfa.alpha_allow[state][s]
        assert sym < dfa.num_symbols or dfa.allow_other[state]
        nxt = dfa.trans[state, min(sym, dfa.num_symbols)]
        fsm.advance(tok)
        state = int(nxt)
    assert fsm.finished and dfa.finished[state]


def _tiny_handler(seed=0):
    cfg = Qwen3Config(vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=1, head_dim=32)
    h = LLMHandler(config=cfg)
    h.initialize(random_init=True, seed=seed)
    return h


def test_device_dfa_greedy_matches_host_loop(monkeypatch):
    """temperature=0: masked-argmax device decode ≡ host FSM loop."""
    h = _tiny_handler()
    kw = dict(caption="lofi hip hop", lyrics="[Instrumental]",
              temperature=0.0, stop_at_reasoning=True, seed=3, max_cot_tokens=200)
    out_dev = h.generate_with_stop_condition(**kw)
    monkeypatch.setenv("ACESTEP_TPU_NO_DEVICE_FSM", "1")
    out_host = h.generate_with_stop_condition(**kw)
    assert out_dev["cot_text"] == out_host["cot_text"]
    assert out_dev["metadata"] == out_host["metadata"]


def test_device_dfa_format_and_metadata():
    h = _tiny_handler(seed=1)
    out = h.generate_with_stop_condition(
        caption="synthwave", lyrics="", temperature=0.9,
        stop_at_reasoning=True, seed=11,
    )
    md = out["metadata"]
    assert 30 <= int(md["bpm"]) <= 300
    assert 10 <= int(md["duration"]) <= 600
    assert int(md["timesignature"]) in (2, 3, 4, 6)
    assert re.match(r"<think>\nbpm: ", out["cot_text"])


def test_device_dfa_user_metadata_injection():
    h = _tiny_handler(seed=2)
    out = h.generate_with_stop_condition(
        caption="jazz", lyrics="", temperature=0.8, stop_at_reasoning=True,
        user_metadata={"bpm": "128", "duration": "42"}, seed=5,
    )
    assert int(out["metadata"]["bpm"]) == 128
    assert int(out["metadata"]["duration"]) == 42


def test_device_dfa_batched_distinct_plans():
    h = _tiny_handler(seed=3)
    out = h.generate_with_stop_condition(
        caption="ambient", lyrics="", temperature=1.0, stop_at_reasoning=True,
        batch_size=3, seed=7,
    )
    assert len(out["batch_metadata"]) == 3
    for md in out["batch_metadata"]:
        assert 30 <= int(md["bpm"]) <= 300


def test_device_dfa_cfg_lockstep():
    h = _tiny_handler(seed=4)
    out = h.generate_with_stop_condition(
        caption="rock", lyrics="", temperature=0.7, cfg_scale=2.0,
        stop_at_reasoning=True, seed=9,
    )
    assert 30 <= int(out["metadata"]["bpm"]) <= 300


def test_oversized_grammar_falls_back_to_host_loop(monkeypatch):
    h = _tiny_handler(seed=6)
    monkeypatch.setattr(LLMHandler, "_DFA_MAX_TABLE_ENTRIES", 1)
    out = h.generate_with_stop_condition(
        caption="folk", lyrics="", temperature=0.5, stop_at_reasoning=True, seed=2,
    )
    assert h._cot_dfa_for(None, 350) is None  # too big -> no device tables
    assert 30 <= int(out["metadata"]["bpm"]) <= 300  # host loop produced CoT


def test_dfa_compile_cached():
    h = _tiny_handler(seed=5)
    d1 = h._cot_dfa_for(None, 350)
    d2 = h._cot_dfa_for(None, 350)
    assert d1 is d2
    d3 = h._cot_dfa_for({"bpm": "90"}, 350)
    assert d3 is not d1


class MockBPETokenizer:
    """Greedy longest-match tokenizer with multi-char merges — exercises the
    FSM/DFA against BPE-like behavior the byte tokenizer can't produce:
    multi-token values with shared prefixes, merged digit pairs, and fixed
    strings collapsing to single tokens."""

    pad_token_id = 0
    bos_token_id = 1
    eos_token_id = 2

    MERGES = [
        "<think>", "</think>", "bpm:", "caption:", "duration:", "keyscale:",
        "language:", "timesignature:", " major", " minor", " 1", " 2", " 3",
        "12", "28", "60", "90", "10", "00", "le", "en", "ja", "es",
    ]

    def __init__(self):
        chars = sorted({chr(c) for c in range(32, 127)} | {"\n"})
        self.pieces = sorted(set(self.MERGES) | set(chars), key=len, reverse=True)
        self.id_of = {p: i + 3 for i, p in enumerate(sorted(set(self.MERGES) | set(chars)))}
        self.piece_of = {i: p for p, i in self.id_of.items()}
        self.vocab_size = len(self.id_of) + 3

    def encode(self, text, max_length=None, add_special_tokens=False):
        out, i = [], 0
        while i < len(text):
            for p in self.pieces:
                if text.startswith(p, i):
                    out.append(self.id_of[p])
                    i += len(p)
                    break
            else:
                i += 1  # unknown char: skip (like byte-fallback dropping)
        return out[:max_length] if max_length else out

    def decode(self, ids):
        return "".join(self.piece_of.get(int(i), "") for i in ids)

    def __call__(self, text, max_length=None):
        return {"input_ids": self.encode(text, max_length)}


@pytest.mark.parametrize("seed", [0, 1])
def test_dfa_matches_fsm_random_walk_bpe(seed):
    """Same lockstep walk as the byte-tokenizer test, against BPE-style
    merges (multi-token values, single-token field names)."""
    tok = MockBPETokenizer()
    def fresh_bpe(md=None):
        f = ConstrainedDecoderFSM(tok)
        f.reset(phase="cot", stop_at_reasoning=True, user_metadata=md)
        return f

    fsm = fresh_bpe()
    dfa = compile_cot_dfa(fresh_bpe(), tok.vocab_size)
    rng = np.random.default_rng(seed)
    state = dfa.start_state
    nl = tok.encode("\n")[0]
    for _ in range(800):
        if fsm.finished:
            assert dfa.finished[state]
            break
        spec = fsm.step_spec()
        if spec.kind == "force":
            tok_id = spec.token
        elif spec.kind == "allow":
            tok_id = int(rng.choice(spec.ids))
            dfa_allowed = {
                int(dfa.alpha_tokens[i]) for i in np.nonzero(dfa.alpha_allow[state])[0]
            }
            assert dfa_allowed == set(spec.ids)
        elif spec.kind == "block":
            cand = [t for t in tok.encode("groove x7") if t not in (spec.ids or [])]
            pool = cand + ([nl] if nl not in (spec.ids or []) else [])
            tok_id = int(rng.choice(pool))
            assert dfa.allow_other[state]
        else:
            pytest.fail(spec.kind)
        sym = dfa.vocab_to_sym[tok_id]
        state = int(dfa.trans[state, min(sym, dfa.num_symbols)])
        fsm.advance(tok_id)
    assert fsm.finished and dfa.finished[state]


def test_dfa_bpe_metadata_injection_multitoken():
    """Injected values tokenized with merges (e.g. '128' → ['12','8'])
    must force the exact multi-token sequence through the DFA."""
    tok = MockBPETokenizer()
    fsm = ConstrainedDecoderFSM(tok)
    fsm.reset(phase="cot", stop_at_reasoning=True,
              user_metadata={"bpm": "128", "duration": "60"})
    dfa = compile_cot_dfa(fsm, tok.vocab_size)
    # greedy-walk the DFA taking the single allowed token wherever forced
    state = dfa.start_state
    out = []
    for _ in range(600):
        if dfa.finished[state]:
            break
        allowed = np.nonzero(dfa.alpha_allow[state])[0]
        if dfa.allow_other[state]:
            t = tok.encode("x")[0]  # caption body: any token
        else:
            t = int(dfa.alpha_tokens[allowed[0]])
        out.append(t)
        sym = dfa.vocab_to_sym[t]
        state = int(dfa.trans[state, min(sym, dfa.num_symbols)])
    text = tok.decode(out)
    assert "bpm: 128\n" in text
    assert "duration: 60\n" in text


# ---------------------------------------------------------------------------
# Round 2: genres grammar (trie + probability fallback), allow-sets > 96,
# repetition penalty, LM batch chunking (VERDICT item 4)
# ---------------------------------------------------------------------------

GENRES_SMALL = ["rock", "jazz", "synthwave", "lofi hip hop", "ambient drone"]
# >96 distinct first tokens exercises the bucketed allow path (97-150 are
# printable single bytes under the byte tokenizer)
GENRES_WIDE = [chr(33 + i) + "x" for i in range(150)]


def _walk_equivalence(fsm_factory, seed, steps=800, vocab=VOCAB, tkz=None):
    """Random-walk the host FSM; assert the DFA tables stay in lockstep."""
    fsm = fsm_factory()
    tkz = tkz or TOK
    dfa = compile_cot_dfa(fsm_factory(), vocab)
    rng = np.random.default_rng(seed)
    state = dfa.start_state
    for _ in range(steps):
        if fsm.finished:
            assert dfa.finished[state]
            break
        spec = fsm.step_spec()
        if spec.kind == "force":
            tok = spec.token
        elif spec.kind == "allow":
            tok = int(rng.choice(spec.ids))
            dfa_allowed = set(
                int(dfa.alpha_tokens[i]) for i in np.nonzero(dfa.alpha_allow[state])[0]
            )
            assert dfa_allowed == set(spec.ids)
            assert not dfa.allow_other[state]
        elif spec.kind in ("block", "prob_end"):
            assert dfa.allow_other[state]
            assert bool(dfa.prob_end[state]) == (spec.kind == "prob_end")
            nl = fsm.canonical_newline
            cand = [t for t in tkz.encode("qz7 ,") if t not in set(spec.ids or [])]
            pool = cand + ([nl] if spec.kind == "prob_end" or nl not in set(spec.ids or []) else [])
            tok = int(rng.choice(pool))
        else:
            pytest.fail(f"unexpected kind {spec.kind}")
        next_state = int(dfa.trans[state, dfa.vocab_to_sym[tok]])
        fsm.advance(tok)
        state = next_state
    else:
        pytest.fail("walk did not finish")
    assert fsm.finished and dfa.finished[state]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_genres_trie_grammar_dfa_equivalence(seed):
    def factory():
        fsm = ConstrainedDecoderFSM(TOK, skip_genres=False, genres_vocab=GENRES_SMALL)
        fsm.reset(phase="cot", stop_at_reasoning=True)
        return fsm

    _walk_equivalence(factory, seed)


@pytest.mark.parametrize("seed", [0, 1])
def test_genres_textfield_fallback_dfa_equivalence(seed):
    """No vocab → probability-ended free text (ref GENRES_VALUE fallback)."""
    def factory():
        fsm = ConstrainedDecoderFSM(TOK, skip_genres=False, genres_vocab=None)
        fsm.reset(phase="cot", stop_at_reasoning=True)
        return fsm

    _walk_equivalence(factory, seed)


@pytest.mark.parametrize("seed", [0])
def test_understand_grammar_dfa_equivalence(seed):
    """Understand phase: constrained metadata (incl. genres) then free tail."""
    def factory():
        fsm = ConstrainedDecoderFSM(TOK, skip_genres=False, genres_vocab=GENRES_SMALL)
        fsm.reset(phase="understand")
        return fsm

    fsm = factory()
    dfa = compile_cot_dfa(factory(), VOCAB)
    rng = np.random.default_rng(seed)
    state = dfa.start_state
    free_steps = 0
    for _ in range(900):
        if fsm.finished:
            break
        spec = fsm.step_spec()
        if spec.kind == "force":
            tok = spec.token
        elif spec.kind == "allow":
            tok = int(rng.choice(spec.ids))
        elif spec.kind in ("block", "prob_end"):
            tok = int(rng.choice([t for t in TOK.encode("qz7 ,")
                                  if t not in set(spec.ids or [])] + [fsm.canonical_newline]))
        elif spec.kind == "free":
            assert dfa.allow_other[state] and not dfa.finished[state]
            free_steps += 1
            tok = fsm.eos_token_id if free_steps > 5 else int(rng.choice(TOK.encode("la la")))
        else:
            pytest.fail(spec.kind)
        next_state = int(dfa.trans[state, dfa.vocab_to_sym[tok]])
        fsm.advance(tok)
        state = next_state
    assert fsm.finished and dfa.finished[state]
    assert free_steps > 5  # the free tail was exercised and EOS ended it


def test_wide_genres_allow_sets_over_96(monkeypatch):
    """Root fan-out of 150 single-token genres: the host loop's bucketed ALLOW
    path must present the FULL set (round-1 silently truncated at 96 and
    forced ids[0])."""

    class WideGenresTok(MockBPETokenizer):
        MERGES = MockBPETokenizer.MERGES + ["genres:"] + [f"g{i:03d}x" for i in range(150)]

    wide_vocab = [f"g{i:03d}x" for i in range(150)]
    tok = WideGenresTok()
    fsm = ConstrainedDecoderFSM(tok, skip_genres=False, genres_vocab=wide_vocab)
    fsm.reset(phase="cot", stop_at_reasoning=True)
    first_tokens = {tok.encode(g)[0] for g in wide_vocab}
    assert len(first_tokens) == 150
    seen_sets = []
    guard = 0
    while not fsm.finished and guard < 500:
        spec = fsm.step_spec()
        if spec.kind == "allow" and len(spec.ids) > 96:
            seen_sets.append(set(spec.ids))
            tok_id = spec.ids[0]
        elif spec.kind == "force":
            tok_id = spec.token
        elif spec.kind == "allow":
            tok_id = spec.ids[0]
        else:
            tok_id = fsm.canonical_newline
        fsm.advance(int(tok_id))
        guard += 1
    assert seen_sets and first_tokens <= seen_sets[0]

    # And the handler host loop samples from the full set without clamping.
    monkeypatch.setenv("ACESTEP_TPU_NO_DEVICE_FSM", "1")
    h = _tiny_handler(seed=9)
    h.tokenizer = tok
    h.genres_vocab = wide_vocab
    h._dfa_cache = {}
    fsms = []
    f = ConstrainedDecoderFSM(tok, skip_genres=False, genres_vocab=wide_vocab,
                              caption_max_tokens=4)
    f.reset(phase="cot", stop_at_reasoning=True)
    fsms.append(f)
    ids, mask, bucket = h._encode_prompts([h.build_formatted_prompt("x", "")], budget=256)
    logits, cache = h._prefill(ids, mask, bucket + 256)
    positions = np.asarray([mask[0].sum()], np.int32)
    gen, _, _, _ = h._constrained_loop(
        fsms, logits, cache, positions, max_new_tokens=256,
        temperature=0.9, top_k=0, top_p=1.0, key=jax.random.PRNGKey(0),
    )
    text = tok.decode(gen[0])
    m = re.search(r"\ngenres:(.*)", text)
    assert m, text
    assert m.group(1).strip() in wide_vocab


def test_repetition_penalty_codes_scan():
    """High repetition penalty forces distinct code tokens (HF semantics over
    the code sub-vocabulary)."""
    from acestep_tpu.models import qwen3 as q3

    cfg = Qwen3Config(vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=1, head_dim=32)
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    n_steps, code_start, n_codes = 40, 50, 64
    first = jnp.asarray([60], jnp.int32)
    pos = jnp.asarray([4], jnp.int32)

    def run(rp):
        cache = q3.KVCache.create(cfg, 1, 8 + n_steps + 4, jnp.float32)
        ids = jnp.asarray([[1, 2, 3, 60]], jnp.int32)
        _, cache = q3.prefill(params, cfg, ids, jnp.ones_like(ids), cache)
        seen0 = jnp.zeros((1, n_codes), bool).at[0, 10].set(True)
        toks, _ = sampling.generate_codes_scan(
            params, cfg, first, pos, cache, jax.random.PRNGKey(1), seen0,
            n_steps=n_steps, code_start=code_start, n_codes=n_codes,
            temperature=0.0, repetition_penalty=rp,
        )
        return np.asarray(toks)[0] - code_start

    lo = run(1.0)
    hi = run(1000.0)
    assert len(set(hi.tolist())) >= len(set(lo.tolist()))
    assert len(set(hi.tolist())) >= n_steps - 2  # essentially all distinct
    assert 10 not in hi.tolist()  # prompt-seeded code blocked


def test_lm_batch_chunking():
    """batch_chunk_size bounds the decode batch; results concatenate."""
    h = _tiny_handler(seed=7)
    out = h.generate_with_stop_condition(
        caption="chunked", lyrics="", temperature=0.9, stop_at_reasoning=True,
        batch_size=5, batch_chunk_size=2, seed=3,
    )
    assert len(out["batch_metadata"]) == 5
    for md in out["batch_metadata"]:
        assert 30 <= int(md["bpm"]) <= 300


# ---------------------------------------------------------------------------
# Realistic byte-level BPE (Qwen-style: trained merges + 64k added audio-code
# special tokens via the `tokenizers` library) — the closest offline stand-in
# for the real Qwen tokenizer the DFA has not yet met (STATUS known-gap).
# ---------------------------------------------------------------------------


class _BBPE:
    """HF-tokenizer-shaped wrapper over a trained `tokenizers` BPE."""

    def __init__(self):
        from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

        from acestep_tpu.utils.constants import VALID_KEYSCALES, VALID_LANGUAGES

        tok = Tokenizer(models.BPE(unk_token=None))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        corpus = (
            [f"bpm: {v}\n" for v in range(30, 301, 7)]
            + [f"duration: {v}\n" for v in range(10, 601, 13)]
            + [f"keyscale: {k}\n" for k in sorted(VALID_KEYSCALES)]
            + [f"language: {l}\n" for l in VALID_LANGUAGES]
            + ["timesignature: 4\n", "caption: an energetic synthwave track\n"] * 50
        ) * 5
        trainer = trainers.BpeTrainer(
            vocab_size=3000, special_tokens=["<pad>", "<bos>", "<eos>"]
        )
        tok.train_from_iterator(corpus, trainer)
        tok.add_special_tokens(
            ["<think>", "</think>", "<|im_start|>", "<|im_end|>"]
            + [f"<|audio_code_{i}|>" for i in range(64000)]
        )
        self._tok = tok
        self.eos_token_id = 2
        self.pad_token_id = 0
        self.vocab_size = tok.get_vocab_size()

    def encode(self, text, max_length=None, add_special_tokens=False):
        ids = self._tok.encode(text).ids
        return ids[:max_length] if max_length else ids

    def decode(self, ids):
        return self._tok.decode([int(i) for i in ids], skip_special_tokens=False)

    def __call__(self, text, max_length=None):
        return {"input_ids": self.encode(text, max_length)}


@pytest.fixture(scope="module")
def bbpe():
    return _BBPE()


@pytest.mark.parametrize("seed", [0, 1])
def test_dfa_walk_realistic_bbpe(bbpe, seed):
    """Random-walk equivalence on trained byte-level BPE merges (multi-token
    values whose merges differ by context — the failure mode mock tokenizers
    can't produce)."""
    def factory():
        f = ConstrainedDecoderFSM(bbpe, skip_genres=False,
                                  genres_vocab=["synthwave", "lofi hip hop", "drone"])
        f.reset(phase="cot", stop_at_reasoning=True)
        return f

    _walk_equivalence(factory, seed, steps=1000, vocab=bbpe.vocab_size, tkz=bbpe)


def test_device_e2e_realistic_bbpe(bbpe):
    """Full two-phase generate on the BBPE tokenizer: code tokens are
    DISCOVERED from the added specials (contiguous 64k range), the device DFA
    emits a valid CoT, and the codes phase samples real code-token ids."""
    cfg = Qwen3Config(vocab_size=bbpe.vocab_size + 64, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=1, head_dim=32)
    h = LLMHandler(config=cfg)
    h.initialize(random_init=True, seed=3)
    h.tokenizer = bbpe
    h.fsm = ConstrainedDecoderFSM(bbpe)
    h._dfa_cache = {}
    h.prefill_cache.clear()
    assert h.fsm.code_token_start > 0 and h.fsm.num_code_tokens == 64_000

    out = h.generate_with_stop_condition(
        caption="synthwave", lyrics="", temperature=0.8,
        target_duration=3.0, seed=11,
    )
    md = out["metadata"]
    assert 30 <= int(md["bpm"]) <= 300
    assert int(md["timesignature"]) in (2, 3, 4, 6)
    codes = out["codes"]
    assert len(codes) == 15  # 3 s × 5 codes/s
    assert all(0 <= c < 64000 for c in codes)
    # the code string round-trips through the shared parser
    assert h.parse_lm_output(out["audio_codes"])[1].count("audio_code") == 15
