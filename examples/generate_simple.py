"""Minimal text2music example (DiT-only path, thinking off).

With checkpoints:  python examples/generate_simple.py --checkpoint-dir <dir>
Without (random weights, for wiring checks): python examples/generate_simple.py
"""

import argparse

from acestep_tpu.lm.handler import LLMHandler
from acestep_tpu.pipeline.handler import AceStepHandler
from acestep_tpu.service.inference import generate_music
from acestep_tpu.service.params import GenerationConfig, GenerationParams

parser = argparse.ArgumentParser()
parser.add_argument("--checkpoint-dir", default=None)
parser.add_argument("--lm-checkpoint-dir", default=None)
parser.add_argument("--thinking", action="store_true")
args = parser.parse_args()

handler = AceStepHandler()
print(handler.initialize_service(args.checkpoint_dir))

llm = None
if args.thinking:
    llm = LLMHandler()
    print(llm.initialize(args.lm_checkpoint_dir))

result = generate_music(
    handler,
    llm,
    GenerationParams(
        caption="an energetic synthwave track with driving bass and dreamy pads",
        lyrics="[Instrumental]",
        duration=30,
        thinking=args.thinking,
        seed=42,
    ),
    GenerationConfig(batch_size=1, audio_format="wav", use_random_seed=False),
)
print(result.status_message)
for audio in result.audios:
    print(" ", audio["path"])
