"""LoRA fine-tune example: build a dataset from an audio directory, train,
export the adapter and generate with it.

    python examples/train_lora.py --audio-dir /data/songs [--checkpoint-dir DIR]
"""

import argparse
import os

from acestep_tpu.pipeline.handler import AceStepHandler
from acestep_tpu.training.dataset import PreprocessedDataset
from acestep_tpu.training.dataset_builder import DatasetBuilder
from acestep_tpu.training.trainer import LoRAConfig, LoRATrainer, TrainingConfig

parser = argparse.ArgumentParser()
parser.add_argument("--audio-dir", required=True)
parser.add_argument("--checkpoint-dir", default=None)
parser.add_argument("--output-dir", default="./lora_example")
parser.add_argument("--rank", type=int, default=32)
parser.add_argument("--max-steps", type=int, default=200)
parser.add_argument("--accum", type=int, default=1, help="gradient accumulation steps")
args = parser.parse_args()

handler = AceStepHandler()
print(handler.initialize_service(args.checkpoint_dir))

# 1. scan + preprocess (sidecar captions/lyrics/CSV are picked up automatically;
#    pass an LLMHandler as the second arg for LM-assisted labeling)
builder = DatasetBuilder(handler)
_, msg = builder.scan_directory(args.audio_dir)
print("scan:", msg)
ds_dir = os.path.join(args.output_dir, "tensors")
_, msg = builder.preprocess_to_tensors(ds_dir)
print(msg)

# 2. train (per-layer param layout)
from acestep_tpu.params import unstack_decoder_params

base = unstack_decoder_params(handler.params, handler.config)
trainer = LoRATrainer(
    base, handler.config,
    LoRAConfig(rank=args.rank),
    TrainingConfig(max_steps=args.max_steps, output_dir=args.output_dir,
                   gradient_accumulation_steps=args.accum),
)
for step, loss, msg in trainer.train(PreprocessedDataset(ds_dir).batches(1)):
    if step % 20 == 0:
        print(msg)

adapter = os.path.join(args.output_dir, "adapter.npz")
print("adapter:", adapter)

# 3. generate with the adapter
handler.load_lora("example", adapter)
out = handler.generate_music(
    captions="in the style of the fine-tune", lyrics="[Instrumental]",
    audio_duration=30.0, batch_size=1, seeds=[1], use_random_seed=False,
)
print("generated latents:", out["latents"].shape)
