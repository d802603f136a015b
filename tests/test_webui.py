"""Studio UI page checks: i18n dictionaries stay in sync with the HTML labels.

The page is static HTML+JS (no gradio); these tests guard the contract the
JS relies on — every translation key must correspond to a text that actually
appears in a legend/label/button, and all languages cover the same keys —
so renaming a label cannot silently orphan its translations.
"""

import json
import re

from acestep_tpu.service.webui import STUDIO_HTML


def _dicts():
    m = re.search(r"const I18N = \{(.*?)\n\};", STUDIO_HTML, re.DOTALL)
    assert m, "I18N block missing"
    block = m.group(1)
    langs = {}
    for lang_m in re.finditer(r"(\w+): \{(.*?)\}", block, re.DOTALL):
        # values never precede a ':', so this matches exactly the keys
        langs[lang_m.group(1)] = re.findall(r'"((?:[^"\\]|\\.)*)":', lang_m.group(2))
    return langs


def test_i18n_languages_cover_same_keys():
    langs = _dicts()
    assert set(langs) == {"zh", "ja", "he"}
    base = set(langs["zh"])
    assert set(langs["ja"]) == base
    assert set(langs["he"]) == base
    assert {"Generate", "Training", "Repaint", "Start training", "Stop"} <= base


def test_i18n_keys_match_page_texts():
    langs = _dicts()
    # Texts the applyLang() walker sees: legend/button/label text nodes.
    texts = set()
    for m in re.finditer(r"<(legend|button[^>]*|label[^>]*|summary[^>]*)>(.*?)</", STUDIO_HTML, re.DOTALL):
        body = re.sub(r"<[^>]+>", "", m.group(2))
        if body.strip():
            texts.add(body.strip())
    for lang, keys in langs.items():
        for k in keys:
            # strings created dynamically in JS, not static page elements
            if k in ("Stop", "Send to Remix", "Send to Repaint", "This mode needs a source audio file",
                     "drafting with the LM…"):
                continue
            assert k in texts, f"{lang} translates {k!r} but no page element has that text"


def test_mode_values_stay_english():
    """MODE_TASK is keyed by the radio input *values*; translation must not
    touch them (only label text nodes are rewritten)."""
    for mode in ("Simple", "Custom", "Remix", "Repaint", "Extract", "Lego", "Complete"):
        assert f'value="{mode}"' in STUDIO_HTML


ALLOW_UNTRANSLATED = set()  # every static page text must have a dict entry


def test_page_texts_all_have_translations():
    langs = _dicts()
    texts = set()
    for m in re.finditer(r"<(legend|button[^>]*|label[^>]*|summary[^>]*)>(.*?)</", STUDIO_HTML, re.DOTALL):
        body = re.sub(r"<[^>]+>", "", m.group(2))
        if body.strip():
            texts.add(body.strip())
    for lang, keys in langs.items():
        missing = texts - set(keys) - ALLOW_UNTRANSLATED
        assert not missing, f"{lang} missing translations for {sorted(missing)}"


def _script_block() -> str:
    m = re.search(r"<script>(.*)</script>", STUDIO_HTML, re.DOTALL)
    assert m, "script block missing"
    return m.group(1)


def _strip_js_literals(js: str) -> str:
    """Remove string literals, template strings and comments so delimiter
    counting can't be fooled by quoted braces. Approximate but sufficient —
    the page's JS uses no regex literals or nested templates."""
    out = []
    i, n = 0, len(js)
    while i < n:
        c = js[i]
        if c in "'\"`":
            q = c
            i += 1
            while i < n and js[i] != q:
                i += 2 if js[i] == "\\" else 1
            i += 1
            out.append('""')
        elif js.startswith("//", i):
            while i < n and js[i] != "\n":
                i += 1
        elif js.startswith("/*", i):
            j = js.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def test_script_delimiters_balanced():
    """No browser or JS engine exists in this environment, so pin the two
    classes of script breakage a browser would catch instantly: unbalanced
    delimiters (syntax death) and dangling element lookups (runtime death)."""
    js = _strip_js_literals(_script_block())
    for open_c, close_c in ("()", "[]", "{}"):
        assert js.count(open_c) == js.count(close_c), (
            f"unbalanced {open_c}{close_c}: "
            f"{js.count(open_c)} vs {js.count(close_c)}"
        )


def test_all_dom_lookups_resolve():
    js = _script_block()
    ids_in_html = set(re.findall(r'id="([^"]+)"', STUDIO_HTML))
    looked_up = set(re.findall(r'\$\("([^"]+)"\)', js))
    missing = looked_up - ids_in_html
    assert not missing, f"$() lookups with no matching element id: {sorted(missing)}"
    # and the radio/mode queries
    for sel in re.findall(r"querySelector\('input\[name=mode\]\[value=\"(\w+)\"\]'\)", js):
        assert f'value="{sel}"' in STUDIO_HTML, sel


def test_load_params_covers_sidecar_fields():
    """Every generation-relevant field the params sidecar writes must be
    handled by the Load-params JS mapping, so a saved run restores fully."""
    from acestep_tpu.service.params import GenerationParams

    js = _script_block()
    handled_explicitly = {
        "task_type", "caption", "lyrics", "duration", "bpm", "keyscale",
        "seed", "batch_size", "inference_steps", "guidance_scale",
        "audio_format", "instrumental", "auto_lrc", "auto_score",
        "repainting_start", "repainting_end", "audio_cover_strength",
        "cover_noise_strength", "track_name", "complete_track_classes",
        "thinking", "audio_codes", "use_adg", "use_cot_metas",
        "use_cot_caption", "lm_temperature", "lm_cfg_scale", "lm_top_k",
        "lm_top_p", "lm_repetition_penalty", "shift", "infer_method",
        "cfg_interval_start", "cfg_interval_end", "vocal_language",
    }
    for field in handled_explicitly:
        assert f'md.{field}' in js or f'"{field}"' in js, (
            f"Load-params JS does not restore {field!r}")
    # fields the UI intentionally does not restore (paths, niche LM knobs)
    ui_unrestored = {
        "instruction", "reference_audio", "src_audio", "timesignature",
        "enable_normalization", "normalization_db", "latent_shift",
        "latent_rescale", "timesteps", "lm_negative_prompt", "use_cot_language",
        "cot_bpm", "cot_keyscale", "cot_timesignature", "cot_duration",
        "cot_vocal_language", "cot_caption", "cot_lyrics", "use_cot_lyrics",
        "use_constrained_decoding",
        # one-call LM pre-phase request flags (ref api_server.py:467-471):
        # the UI drives the same phases through its Create/Format tool
        # buttons, and a saved sidecar already carries the DRAFTED
        # caption/lyrics — restoring the flag would re-draft on replay.
        "sample_mode", "sample_query", "use_format",
    }
    import dataclasses

    all_fields = {f.name for f in dataclasses.fields(GenerationParams)}
    unknown = all_fields - handled_explicitly - ui_unrestored
    assert not unknown, f"new GenerationParams fields unclassified for the UI: {sorted(unknown)}"
