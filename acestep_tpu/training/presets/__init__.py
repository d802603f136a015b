"""VRAM/HBM training presets (role parity with training_v2/presets/*.json)."""

import json
import os
from typing import Any, Dict

_DIR = os.path.dirname(os.path.abspath(__file__))


def list_presets():
    return sorted(f[:-5] for f in os.listdir(_DIR) if f.endswith(".json"))


def load_preset(name: str) -> Dict[str, Any]:
    with open(os.path.join(_DIR, name + ".json")) as f:
        return json.load(f)
