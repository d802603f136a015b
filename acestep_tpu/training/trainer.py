"""LoRA trainer over preprocessed tensors — the "Side-Step"-corrected trainer.

Role parity with the reference `LoRATrainer.train_from_preprocessed`
(`acestep/training/trainer.py:495-1117`) and the corrected `FixedLoRATrainer`
(`acestep/training_v2/trainer_fixed.py:71`): continuous logit-normal timestep
sampling matching the model's training distribution (`timestep_sampling.py:20-110`),
CFG condition dropout, non-finite-grad skip accounting, periodic checkpoints
with resume. Decoder-only: conditions come precomputed from the dataset, so
each step is one jitted decoder fwd/bwd.

Checkpoints use orbax; metrics stream to a JSONL file (and TensorBoard when
available).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acestep_tpu.config import AceStepConfig
from acestep_tpu.models import dit
from acestep_tpu.training.lora import (
    apply_lokr,
    apply_lora,
    init_lokr_params,
    init_lora_params,
    merge_lora,
)
from acestep_tpu.training.train_step import (
    sample_discrete_timesteps,
    sample_timesteps,
)


@dataclasses.dataclass
class LoRAConfig:
    rank: int = 32
    alpha: float = 32.0
    adapter_type: str = "lora"  # "lora" | "lokr" (ref LoKRTrainer via LyCORIS)
    lokr_factor: int = 8
    targets: Tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


@dataclasses.dataclass
class TrainingConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    warmup_steps: int = 50
    max_steps: int = 1000
    batch_size: int = 1
    cfg_ratio: float = 0.15
    timestep_mu: float = -0.4
    timestep_sigma: float = 1.0
    # "sidestep": continuous logit-normal (training_v2 corrected sampling);
    # "v1_discrete": uniform over the 8-value turbo shift=3 schedule — the v1
    # trainer's draw (ref trainer.py:303-326), needed to reproduce LoRAs
    # trained under v1.
    timestep_sampling: str = "sidestep"
    checkpoint_every: int = 200
    gradient_accumulation_steps: int = 1  # ref trainer.py:722,822-843
    log_every: int = 10
    seed: int = 0
    output_dir: str = "./lora_output"
    resume_from: Optional[str] = None

    def __post_init__(self):
        # Misspelling this flag must not silently train with the wrong
        # timestep distribution (a non-reproducing adapter with no error).
        if self.timestep_sampling not in ("sidestep", "v1_discrete"):
            raise ValueError(
                f"timestep_sampling must be 'sidestep' or 'v1_discrete', "
                f"got {self.timestep_sampling!r}"
            )


def decoder_flow_matching_loss(
    lora_params: Dict[str, Any],
    base_decoder: Dict[str, Any],
    null_condition_emb: jax.Array,
    cfg: AceStepConfig,
    lcfg: LoRAConfig,
    tcfg: TrainingConfig,
    batch: Dict[str, jax.Array],
    key: jax.Array,
) -> jax.Array:
    """Decoder-only flow-matching MSE (ref trainer.py:327-493 math, corrected
    timesteps).  batch: target_latents (B,T,64), context_latents (B,T,128),
    attention_mask (B,T), encoder_hidden_states (B,L,D), encoder_attention_mask (B,L)."""
    k_t, k_noise, k_drop = jax.random.split(key, 3)
    x0 = batch["target_latents"]
    b = x0.shape[0]

    if lcfg.adapter_type == "lokr":
        decoder = apply_lokr(base_decoder, lora_params)
    else:
        decoder = apply_lora(base_decoder, lora_params, alpha=lcfg.alpha, rank=lcfg.rank)

    enc = batch["encoder_hidden_states"]
    drop = jax.random.uniform(k_drop, (b, 1, 1)) < tcfg.cfg_ratio
    null = jnp.broadcast_to(null_condition_emb.astype(enc.dtype), enc.shape)
    enc = jnp.where(drop, null, enc)

    if tcfg.timestep_sampling == "v1_discrete":
        t = sample_discrete_timesteps(k_t, b)
    else:
        t = sample_timesteps(k_t, b, tcfg.timestep_mu, tcfg.timestep_sigma)
    noise = jax.random.normal(k_noise, x0.shape, dtype=jnp.float32).astype(x0.dtype)
    t_ = t[:, None, None].astype(x0.dtype)
    xt = t_ * noise + (1.0 - t_) * x0

    cross_kvs = dit.precompute_cross_kv(decoder, cfg, enc)
    v_pred = dit.dit_forward(
        decoder, cfg, xt, t, t, batch["context_latents"], cross_kvs,
        encoder_mask=batch["encoder_attention_mask"],
        latent_mask=batch["attention_mask"],
    )
    err = (v_pred.astype(jnp.float32) - (noise - x0).astype(jnp.float32)) ** 2
    m = batch["attention_mask"].astype(jnp.float32)[:, :, None]
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)


class LoRATrainer:
    """Generator-style trainer: yields (step, loss, message) like the reference."""

    def __init__(
        self,
        base_params: Dict[str, Any],
        model_config: AceStepConfig,
        lora_config: Optional[LoRAConfig] = None,
        training_config: Optional[TrainingConfig] = None,
    ):
        self.base = base_params
        self.cfg = model_config
        self.lcfg = lora_config or LoRAConfig()
        self.tcfg = training_config or TrainingConfig()
        self.nonfinite_steps = 0

        key = jax.random.PRNGKey(self.tcfg.seed)
        if self.lcfg.adapter_type == "lokr":
            self.lora = init_lokr_params(
                key, base_params["decoder"], rank=self.lcfg.rank,
                factor=self.lcfg.lokr_factor, targets=self.lcfg.targets,
            )
        else:
            self.lora = init_lora_params(
                key, base_params["decoder"], rank=self.lcfg.rank, targets=self.lcfg.targets
            )
        sched = optax.warmup_cosine_decay_schedule(
            0.0, self.tcfg.learning_rate, self.tcfg.warmup_steps,
            max(self.tcfg.max_steps, self.tcfg.warmup_steps + 1),
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.tcfg.max_grad_norm),
            optax.adamw(sched, weight_decay=self.tcfg.weight_decay),
        )
        if self.tcfg.gradient_accumulation_steps > 1:
            # Gradient accumulation (ref trainer.py:722,822-843): optimizer
            # updates apply every k micro-batches; intermediate steps only
            # accumulate (one jitted program either way).
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=self.tcfg.gradient_accumulation_steps
            )
        self.opt_state = self.tx.init(self.lora)
        self.step = 0
        self._jit_step = self._build_step()

    def _build_step(self):
        # Base weights are ARGUMENTS, not closure constants: closing over the
        # ~4 GB decoder bakes it into the HLO upload (fails on remote-compile
        # relays and bloats every recompile).
        cfg, lcfg, tcfg, tx = self.cfg, self.lcfg, self.tcfg, self.tx

        def train_step(lora, opt_state, base_decoder, null_emb, batch, key):
            loss, grads = jax.value_and_grad(decoder_flow_matching_loss)(
                lora, base_decoder, null_emb, cfg, lcfg, tcfg, batch, key
            )
            finite = jnp.all(
                jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
            ) & jnp.isfinite(loss)
            grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, new_opt = tx.update(grads, opt_state, lora)
            new_lora = optax.apply_updates(lora, updates)
            new_lora = jax.tree.map(lambda n, o: jnp.where(finite, n, o), new_lora, lora)
            return new_lora, new_opt, loss, finite

        jitted = jax.jit(train_step, donate_argnums=(0, 1))

        def step(lora, opt_state, batch, key):
            return jitted(
                lora, opt_state, self.base["decoder"], self.base["null_condition_emb"],
                batch, key,
            )

        return step

    # ------------------------------------------------------------------

    def train(self, batches: Iterator[Dict[str, np.ndarray]]):
        """Yields (step, loss, message) per optimizer step (ref :495-1117)."""
        os.makedirs(self.tcfg.output_dir, exist_ok=True)
        metrics_path = os.path.join(self.tcfg.output_dir, "metrics.jsonl")
        if self.tcfg.resume_from:
            self.load_checkpoint(self.tcfg.resume_from)
        key = jax.random.PRNGKey(self.tcfg.seed + 1)

        with open(metrics_path, "a") as metrics_f:
            for batch in batches:
                if self.step >= self.tcfg.max_steps:
                    break
                key, sub = jax.random.split(key)
                jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.lora, self.opt_state, loss, finite = self._jit_step(
                    self.lora, self.opt_state, jbatch, sub
                )
                self.step += 1
                loss_f = float(loss)
                if not bool(finite):
                    self.nonfinite_steps += 1
                if not math.isfinite(loss_f):
                    # json.dumps would emit a bare NaN token — invalid JSON
                    # that breaks strict clients and the UI run list. The
                    # skipped step is recorded via nonfinite_steps.
                    loss_f = None
                msg = f"step {self.step} loss {loss_f if loss_f is None else f'{loss_f:.4f}'}"
                if self.step % self.tcfg.log_every == 0:
                    metrics_f.write(json.dumps({
                        "step": self.step, "loss": loss_f, "time": time.time(),
                        "nonfinite_steps": self.nonfinite_steps,
                    }) + "\n")
                    metrics_f.flush()
                if self.step % self.tcfg.checkpoint_every == 0:
                    self.save_checkpoint()
                    msg += " [checkpoint]"
                yield self.step, loss_f, msg
        self.save_checkpoint()

    # ------------------------------------------------------------------
    # Checkpoint / resume (ref trainer.py:755-819, trainer_fixed.py:193-216)
    # ------------------------------------------------------------------

    def _ckpt_dir(self) -> str:
        return os.path.join(os.path.abspath(self.tcfg.output_dir), "checkpoints")

    def save_checkpoint(self) -> str:
        import orbax.checkpoint as ocp

        path = os.path.join(self._ckpt_dir(), f"step_{self.step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"lora": self.lora, "opt_state": self.opt_state,
                          "step": np.asarray(self.step)}, force=True)
        ckptr.wait_until_finished()
        # adapter-only export for serving (ref _save_adapter_flat)
        np.savez(
            os.path.join(self.tcfg.output_dir, "adapter.npz"),
            **{f"{p}|{f}": np.asarray(v) for p, ab in self.lora.items() for f, v in ab.items()},
            __meta__=np.asarray(
                json.dumps({"rank": self.lcfg.rank, "alpha": self.lcfg.alpha,
                            "adapter_type": self.lcfg.adapter_type, "step": self.step})
            ),
        )
        return path

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {"lora": self.lora, "opt_state": self.opt_state, "step": np.asarray(0)}
        restored = ckptr.restore(os.path.abspath(path), target)
        self.lora = restored["lora"]
        self.opt_state = restored["opt_state"]
        self.step = int(restored["step"])

    def export_merged(self) -> Dict[str, Any]:
        """Merge the adapter into the base decoder (for adapter-free serving)."""
        merged = dict(self.base)
        if self.lcfg.adapter_type == "lokr":
            merged["decoder"] = apply_lokr(self.base["decoder"], self.lora)
        else:
            merged["decoder"] = merge_lora(
                self.base["decoder"], self.lora, alpha=self.lcfg.alpha, rank=self.lcfg.rank
            )
        return merged


def load_adapter(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load an adapter.npz exported by `save_checkpoint`."""
    lora: Dict[str, Any] = {}
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        for k in z.files:
            if k == "__meta__":
                continue
            p, f = k.rsplit("|", 1)
            lora.setdefault(p, {})[f] = jnp.asarray(z[k])
    return lora, meta
