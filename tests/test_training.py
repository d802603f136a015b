"""Training subsystem tests: LoRA math, dataset, trainer loop, checkpoints."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.config import AceStepConfig
from acestep_tpu.params import init_acestep_params
from acestep_tpu.training.dataset import PreprocessedDataset, save_sample, write_manifest
from acestep_tpu.training.lora import apply_lora, init_lora_params, merge_lora
from acestep_tpu.training.trainer import (
    LoRAConfig,
    LoRATrainer,
    TrainingConfig,
    load_adapter,
)

TINY = AceStepConfig(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
    sliding_window=4,
    text_hidden_dim=16,
    num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=1,
    num_attention_pooler_hidden_layers=1,
    fsq_dim=32,
    timbre_fix_frame=8,
)


@pytest.fixture(scope="module")
def base_params():
    return init_acestep_params(jax.random.PRNGKey(0), TINY, jnp.float32)


def test_lora_init_targets_and_identity(base_params):
    lora = init_lora_params(jax.random.PRNGKey(1), base_params["decoder"], rank=4)
    # decoder: 2 layers × (self 4 + cross 4 + mlp 3) = 22 targets
    assert len(lora) == 22
    # B init zero → adapted == base
    adapted = apply_lora(base_params["decoder"], lora, alpha=8.0, rank=4)
    k0 = base_params["decoder"]["layers"][0]["self_attn"]["q_proj"]["kernel"]
    k1 = adapted["layers"][0]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))


def test_lora_apply_changes_weights(base_params):
    lora = init_lora_params(jax.random.PRNGKey(2), base_params["decoder"], rank=4)
    path = next(iter(lora))
    lora[path]["b"] = jnp.ones_like(lora[path]["b"])
    adapted = apply_lora(base_params["decoder"], lora, alpha=8.0, rank=4)
    node_base, node_adapted = base_params["decoder"], adapted
    for p in path.split("/"):
        node_base = node_base[int(p)] if isinstance(node_base, list) else node_base[p]
        node_adapted = node_adapted[int(p)] if isinstance(node_adapted, list) else node_adapted[p]
    assert np.abs(np.asarray(node_adapted) - np.asarray(node_base)).max() > 0


def _make_dataset(tmp_path, n=3, t=20, l=12):
    os.makedirs(tmp_path, exist_ok=True)
    rng = np.random.default_rng(0)
    entries = []
    for i in range(n):
        sample = {
            "target_latents": rng.standard_normal((t, 64)).astype(np.float32),
            "encoder_hidden_states": rng.standard_normal((l, TINY.hidden_size)).astype(np.float32),
            "encoder_attention_mask": np.ones((l,), np.int32),
            "context_latents": rng.standard_normal((t, 128)).astype(np.float32),
            "attention_mask": np.ones((t,), np.int32),
        }
        fname = f"sample_{i}.npz"
        save_sample(os.path.join(tmp_path, fname), sample)
        entries.append({"file": fname})
    write_manifest(str(tmp_path), entries)
    return str(tmp_path)


def test_dataset_batching(tmp_path):
    ds_dir = _make_dataset(tmp_path)
    ds = PreprocessedDataset(ds_dir)
    assert len(ds) == 3
    batch = next(ds.batches(2, shuffle=False, pad_multiple=8))
    assert batch["target_latents"].shape == (2, 24, 64)
    assert batch["encoder_hidden_states"].shape[0] == 2
    assert batch["attention_mask"][:, :20].all()
    assert not batch["attention_mask"][:, 20:].any()


def test_dataset_batching_oversized_batch(tmp_path):
    """batch_size > dataset must still yield (clamped to the dataset) — the
    old range() yielded nothing while looping forever, hanging the training
    worker in an unstoppable spin. Empty datasets fail loudly."""
    import pytest

    ds_dir = _make_dataset(tmp_path)
    ds = PreprocessedDataset(ds_dir)
    batch = next(ds.batches(8, shuffle=False, pad_multiple=8))
    assert batch["target_latents"].shape[0] == 3  # clamped to len(ds)

    empty_dir = tmp_path / "empty"
    empty_dir.mkdir()
    write_manifest(str(empty_dir), [])
    with pytest.raises(ValueError, match="empty"):
        next(PreprocessedDataset(str(empty_dir)).batches(2))


def test_trainer_loss_decreases_and_checkpoints(base_params, tmp_path):
    ds_dir = _make_dataset(tmp_path / "data")
    os.makedirs(ds_dir, exist_ok=True)
    ds = PreprocessedDataset(ds_dir)
    out_dir = str(tmp_path / "run")
    trainer = LoRATrainer(
        base_params,
        TINY,
        LoRAConfig(rank=4, alpha=8.0),
        TrainingConfig(
            learning_rate=1e-2, max_steps=6, checkpoint_every=3, log_every=2,
            output_dir=out_dir, warmup_steps=1,
        ),
    )
    losses = [loss for _, loss, _ in trainer.train(ds.batches(2, shuffle=False))]
    assert len(losses) == 6
    assert all(np.isfinite(losses))
    assert os.path.exists(os.path.join(out_dir, "adapter.npz"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))

    lora, meta = load_adapter(os.path.join(out_dir, "adapter.npz"))
    assert meta["rank"] == 4 and meta["step"] == 6
    assert len(lora) == 22

    # resume restores step counter
    ckpts = sorted(os.listdir(os.path.join(out_dir, "checkpoints")))
    trainer2 = LoRATrainer(base_params, TINY, LoRAConfig(rank=4, alpha=8.0),
                           TrainingConfig(output_dir=out_dir, max_steps=6))
    trainer2.load_checkpoint(os.path.join(out_dir, "checkpoints", ckpts[-1]))
    assert trainer2.step == 6


def test_stacked_lora_registry_matches_unstacked(base_params, tmp_path):
    """Serving-side stacked application == training-side unstacked application."""
    from acestep_tpu.models import dit
    from acestep_tpu.pipeline.lora_manager import apply_lora_stacked

    lora = init_lora_params(jax.random.PRNGKey(3), base_params["decoder"], rank=4)
    for path in lora:
        lora[path]["b"] = jax.random.normal(jax.random.PRNGKey(hash(path) % 2**31), lora[path]["b"].shape) * 0.1

    plain = apply_lora(base_params["decoder"], lora, alpha=8.0, rank=4)
    stacked_base = dit.stack_acestep_params(base_params, TINY)["decoder"]
    stacked_applied = apply_lora_stacked(stacked_base, lora, n_layers=2, alpha=8.0, rank=4)

    # compare layer 0 (sliding group idx 0) q_proj kernel
    a = np.asarray(plain["layers"][0]["self_attn"]["q_proj"]["kernel"])
    b = np.asarray(stacked_applied["layers"]["sliding"][ "self_attn"]["q_proj"]["kernel"][0])
    np.testing.assert_allclose(a, b, atol=1e-6)
    a1 = np.asarray(plain["layers"][1]["mlp"]["down_proj"]["kernel"])
    b1 = np.asarray(stacked_applied["layers"]["full"]["mlp"]["down_proj"]["kernel"][0])
    np.testing.assert_allclose(a1, b1, atol=1e-6)


def test_lokr_adapter_identity_and_training(base_params, tmp_path):
    from acestep_tpu.training.lora import apply_lokr, init_lokr_params

    lokr = init_lokr_params(jax.random.PRNGKey(5), base_params["decoder"], rank=2, factor=4)
    assert len(lokr) == 22
    # zero-init w2b → adapted == base
    adapted = apply_lokr(base_params["decoder"], lokr)
    k0 = np.asarray(base_params["decoder"]["layers"][0]["self_attn"]["q_proj"]["kernel"])
    k1 = np.asarray(adapted["layers"][0]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(k0, k1)
    # kron shapes valid after perturbation
    p0 = next(iter(lokr))
    lokr[p0]["w2b"] = jnp.ones_like(lokr[p0]["w2b"])
    adapted2 = apply_lokr(base_params["decoder"], lokr)
    node = adapted2
    for p in p0.split("/"):
        node = node[int(p)] if isinstance(node, list) else node[p]
    assert np.abs(np.asarray(node) - k0).max() >= 0  # shape-compatible

    ds_dir = _make_dataset(tmp_path / "lokr_data")
    ds = PreprocessedDataset(ds_dir)
    trainer = LoRATrainer(
        base_params, TINY,
        LoRAConfig(rank=2, adapter_type="lokr", lokr_factor=4),
        TrainingConfig(learning_rate=1e-2, max_steps=2, checkpoint_every=2,
                       output_dir=str(tmp_path / "lokr_run"), warmup_steps=1),
    )
    losses = [l for _, l, _ in trainer.train(ds.batches(2, shuffle=False))]
    assert len(losses) == 2 and all(np.isfinite(losses))


def test_gradient_sensitivity_estimation(base_params, tmp_path):
    """Side-Step `estimate` parity: per-module grad-norm ranking over real
    flow-matching batches, on both parameter layouts."""
    from acestep_tpu.models.dit import stack_acestep_params
    from acestep_tpu.training.estimate import run_estimation

    ds_dir = _make_dataset(tmp_path / "est", n=2, t=16, l=8)
    ds = PreprocessedDataset(ds_dir)
    full = dict(base_params)
    full["null_condition_emb"] = base_params.get(
        "null_condition_emb", jnp.zeros((1, 1, TINY.hidden_size), jnp.float32)
    )

    res = run_estimation(full, TINY, ds.batches(1, shuffle=False),
                         num_batches=2, top_k=16)
    assert res and all(r["sensitivity"] >= 0 for r in res)
    assert res == sorted(res, key=lambda r: r["sensitivity"], reverse=True)
    # module names cover both attention blocks across the 2 layers
    names = {r["module"] for r in res}
    assert any("self_attn" in n for n in names)
    assert any("cross_attn" in n for n in names)
    assert all(n.startswith("layers.") for n in names)

    # layer granularity aggregates to one entry per layer
    res_layer = run_estimation(full, TINY, ds.batches(1, shuffle=False),
                               num_batches=2, top_k=8, granularity="layer")
    assert {r["module"] for r in res_layer} <= {"layers.0", "layers.1"}

    # stacked layout produces the same module name set (sensitivities on the
    # same data/seed should match the unstacked run closely)
    stacked = stack_acestep_params(full, TINY)
    res_stacked = run_estimation(stacked, TINY, ds.batches(1, shuffle=False),
                                 num_batches=2, top_k=16)
    assert {r["module"] for r in res_stacked} == names
    a = {r["module"]: r["sensitivity"] for r in res}
    b = {r["module"]: r["sensitivity"] for r in res_stacked}
    for m in names:
        assert abs(a[m] - b[m]) <= 1e-3 * max(1.0, abs(a[m])), m


def test_v1_discrete_timestep_sampling(base_params, tmp_path):
    """`timestep_sampling="v1_discrete"` reproduces the v1 trainer's draw:
    uniform over the 8-value turbo shift=3 schedule (ref trainer.py:56-57,
    303-326), while "sidestep" stays continuous — the flag exists so adapters
    trained under v1 can be reproduced exactly."""
    from acestep_tpu.models.dit import SHIFT_TIMESTEPS
    from acestep_tpu.training.train_step import (
        sample_discrete_timesteps,
        sample_timesteps,
    )

    schedule = {float(np.float32(v)) for v in SHIFT_TIMESTEPS[3.0]}
    assert len(schedule) == 8
    # The discrete sampler emits ONLY schedule values, and covers them.
    t = np.asarray(sample_discrete_timesteps(jax.random.PRNGKey(0), 4096))
    seen = {float(v) for v in t}
    assert seen == schedule
    # The corrected sampler is continuous: large draws are almost all distinct
    # and (generically) miss the 8 exact schedule values.
    tc = np.asarray(sample_timesteps(jax.random.PRNGKey(0), 4096))
    assert len(np.unique(tc)) > 4000
    assert not ({float(v) for v in tc} & schedule)

    # Both modes train end-to-end on the tiny config.
    ds_dir = _make_dataset(tmp_path / "v1_data")
    for mode in ("v1_discrete", "sidestep"):
        ds = PreprocessedDataset(ds_dir)
        trainer = LoRATrainer(
            base_params, TINY, LoRAConfig(rank=2),
            TrainingConfig(learning_rate=1e-2, max_steps=2, checkpoint_every=10,
                           warmup_steps=1, timestep_sampling=mode,
                           output_dir=str(tmp_path / f"run_{mode}")),
        )
        losses = [l for _, l, _ in trainer.train(ds.batches(2, shuffle=False))]
        assert len(losses) == 2 and all(np.isfinite(losses)), mode

    # REST surface accepts the flag (service/train_api.py start_run).
    import inspect

    from acestep_tpu.service import train_api

    src = inspect.getsource(train_api.TrainingService.start_run)
    assert "timestep_sampling" in src

    # A misspelled mode must fail loudly, not silently train with the wrong
    # timestep distribution (a non-reproducing adapter with no error).
    import pytest

    for bad in ("v1-discrete", "V1_discrete", "discrete", ""):
        with pytest.raises(ValueError, match="timestep_sampling"):
            TrainingConfig(timestep_sampling=bad)


def test_gradient_accumulation_multisteps(tmp_path):
    """gradient_accumulation_steps=2 halves the number of applied optimizer
    updates (optax.MultiSteps; ref trainer.py:722,822-843)."""
    import jax
    import jax.numpy as jnp

    from acestep_tpu.params import init_acestep_params
    from acestep_tpu.training.trainer import LoRAConfig, LoRATrainer, TrainingConfig

    cfg = TINY
    base = init_acestep_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {
                "target_latents": rng.standard_normal((1, 16, 64)).astype(np.float32),
                "context_latents": rng.standard_normal((1, 16, 128)).astype(np.float32),
                "attention_mask": np.ones((1, 16), np.int32),
                "encoder_hidden_states": rng.standard_normal((1, 8, cfg.hidden_size)).astype(np.float32),
                "encoder_attention_mask": np.ones((1, 8), np.int32),
            }

    def run(accum, steps=6):
        trainer = LoRATrainer(
            base, cfg, LoRAConfig(rank=2),
            TrainingConfig(max_steps=steps, gradient_accumulation_steps=accum,
                           warmup_steps=1, output_dir=str(tmp_path / f"a{accum}"),
                           checkpoint_every=100),
        )
        snaps = []
        for step, loss, _ in trainer.train(batches()):
            snaps.append(np.concatenate(
                [np.asarray(x).ravel() for x in jax.tree.leaves(trainer.lora)]
            ))
            if step >= steps:
                break
        return snaps

    def n_changes(snaps):
        return sum(
            0 if np.array_equal(a, b) else 1 for a, b in zip(snaps, snaps[1:])
        )

    plain = n_changes(run(1))
    accum = n_changes(run(2))
    assert plain >= 4  # every micro-step applies (first may be lr=0 warmup)
    assert 1 <= accum <= plain // 2 + 1  # applies only every 2nd micro-step
