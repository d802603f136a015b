"""Env-gated debug spans (ref `acestep/debug_utils.py` debug_start/end with
per-domain switches, domains at `constants.py:203-215`).

Enable with ACESTEP_TPU_DEBUG="generation,lm" (comma list) or "all" / "1".
Spans print elapsed wall time to stderr; disabled domains cost one dict probe.
NOTE: on-device work is async — a span brackets dispatch unless the code
inside forces a readback; use jax.profiler traces for device-time attribution.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Iterator

DOMAINS = ("generation", "lm", "vae", "training", "service", "io")


def _enabled_domains() -> set:
    raw = os.environ.get("ACESTEP_TPU_DEBUG", "")
    if raw in ("1", "all"):
        return set(DOMAINS)
    return {d.strip() for d in raw.split(",") if d.strip()}


def enabled(domain: str) -> bool:
    return domain in _enabled_domains()


def log(domain: str, msg: str) -> None:
    if enabled(domain):
        print(f"[debug:{domain}] {msg}", file=sys.stderr, flush=True)


@contextlib.contextmanager
def span(domain: str, name: str) -> Iterator[None]:
    """Timed span; no-op unless the domain is enabled."""
    if not enabled(domain):
        yield
        return
    t0 = time.time()
    print(f"[debug:{domain}] {name} ...", file=sys.stderr, flush=True)
    try:
        yield
    finally:
        print(f"[debug:{domain}] {name} took {time.time() - t0:.3f}s",
              file=sys.stderr, flush=True)
