"""Child process for the bench kill-survival test (test_bench_smoke.py).

Runs the EXACT driver entry (`bench.main()`) on CPU with the full-size
handler constructors patched to the tiny test handlers, so the parent test
can deliver a real SIGTERM/SIGKILL mid-run and assert the stdout tail still
parses — the failure mode that produced BENCH_r04.json rc=124 with zero
output (VERDICT r4 next #1e).
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

# Same platform forcing as tests/conftest.py: CPU backend, no axon tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if ".axon_site" not in p
)

# Tiny-but-complete bench matrix; the parent kills the run partway through.
os.environ.setdefault("BENCH_PROBE", "0")
os.environ.setdefault("BENCH_DURATION_S", "2")
os.environ.setdefault("BENCH_REPS", "2")
os.environ.setdefault("BENCH_BATCH", "1")
os.environ.setdefault("BENCH_QUIET_PASSES", "1")
os.environ.setdefault("BENCH_RETRY_WAIT_S", "0")
os.environ.setdefault("BENCH_LONG_DURATION_S", "3")
os.environ.setdefault("BENCH_LONG_REPS", "1")
os.environ.setdefault("BENCH_LONG600_DURATION_S", "3")
os.environ.setdefault("BENCH_THINK_REPS", "1")
os.environ.setdefault("BENCH_FULLSONG_DURATION_S", "2")
os.environ.setdefault("BENCH_FULLSONG_REPS", "1")
os.environ.setdefault("BENCH_TTFA_DURATION_S", "3")
os.environ.setdefault("BENCH_TTFA_REPS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import acestep_tpu.lm.handler as lm_mod  # noqa: E402
import acestep_tpu.pipeline.handler as pipe_mod  # noqa: E402
from acestep_tpu.lm.handler import LLMHandler  # noqa: E402
from acestep_tpu.pipeline.handler import AceStepHandler  # noqa: E402
from tests.test_service import TINY_DIT, TINY_LM, TINY_TEXT, TINY_VAE  # noqa: E402

pipe_mod.LATENT_BUCKETS = (64, 128)
pipe_mod.TEXT_BUCKETS = (32, 64)
pipe_mod.LYRIC_BUCKETS = (32, 64)

_dit = AceStepHandler(TINY_DIT, TINY_VAE, TINY_TEXT, dtype=jnp.float32)
_dit.initialize_service(random_init=True)
_llm = LLMHandler(TINY_LM, dtype=jnp.float32)
_llm.initialize(random_init=True)


class _FakeDit:
    def __new__(cls, *a, **k):  # noqa: ARG003
        return _dit


class _FakeLLM:
    def __new__(cls, *a, **k):  # noqa: ARG003
        return _llm


pipe_mod.AceStepHandler = _FakeDit
lm_mod.LLMHandler = _FakeLLM

import bench  # noqa: E402

bench.main()
