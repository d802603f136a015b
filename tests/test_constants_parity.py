"""Wire-format constants parity vs the reference (runs only where the
reference checkout exists). The LM was trained on these exact strings —
TASK_INSTRUCTIONS / TRACK_NAMES / task lists must match byte-for-byte, so
this pins them against `/root/reference/acestep/constants.py` parsed with
`ast` (no reference code is executed)."""

import ast
import os

import pytest

from acestep_tpu.utils import constants as C

REF = "/root/reference/acestep/constants.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not present"
)


def _ref_constants():
    tree = ast.parse(open(REF, encoding="utf-8").read())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name):
            try:
                out[node.targets[0].id] = ast.literal_eval(node.value)
            except ValueError:
                pass
    return out


def test_task_instructions_match_reference():
    ref = _ref_constants()
    assert C.TASK_INSTRUCTIONS == ref["TASK_INSTRUCTIONS"]


def test_track_names_match_reference():
    ref = _ref_constants()
    assert list(C.TRACK_NAMES) == list(ref["TRACK_NAMES"])


def test_task_type_lists_match_reference():
    ref = _ref_constants()
    assert list(C.TASK_TYPES) == list(ref["TASK_TYPES"])
    assert list(C.TASK_TYPES_TURBO) == list(ref["TASK_TYPES_TURBO"])


def test_duration_bounds_match_reference():
    ref = _ref_constants()
    for name in ("MIN_AUDIO_DURATION", "MAX_AUDIO_DURATION"):
        if name in ref and hasattr(C, name):
            assert getattr(C, name) == ref[name], name
