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
            if k in ("Stop", "Send to Remix", "This mode needs a source audio file"):
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
