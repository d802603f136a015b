"""Flow-matching training step (full-parameter and LoRA variants).

Loss math mirrors the reference training forward
(`modeling_acestep_v15_turbo.py:1651-1725`): logit-normal timesteps
t = sigmoid(σ·N(0,1) + μ) (the Side-Step-corrected continuous sampling,
`training_v2/timestep_sampling.py:20-110`), CFG condition dropout to the null
embedding, xt = t·noise + (1-t)·x0, MSE on v = noise − x0.

The step is a single jitted program; under a (dp, tp) mesh the batch is
sharded on dp and gradients are averaged by XLA's reduction of the mean loss —
no explicit psum needed at this level.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from acestep_tpu.config import AceStepConfig
from acestep_tpu.models import dit
from acestep_tpu.training.lora import apply_lora


def sample_timesteps(key, batch_size: int, mu: float = -0.4, sigma: float = 1.0) -> jax.Array:
    """Continuous logit-normal timesteps (Side-Step corrected sampling)."""
    return jax.nn.sigmoid(jax.random.normal(key, (batch_size,)) * sigma + mu)


def sample_discrete_timesteps(key, batch_size: int) -> jax.Array:
    """v1 "bug-compatible" discrete draw: uniform over the turbo shift=3
    inference schedule (ref `training/trainer.py:303-326`,
    `TURBO_SHIFT3_TIMESTEPS` :56-57). Existing v1-trained LoRAs saw ONLY these
    8 timestep values during training; reproducing such an adapter requires
    the same distribution, so both samplers ship (`timestep_sampling` flag)."""
    schedule = jnp.asarray(dit.SHIFT_TIMESTEPS[3.0], jnp.float32)
    idx = jax.random.randint(key, (batch_size,), 0, schedule.shape[0])
    return schedule[idx]


def flow_matching_loss(
    params: Any,
    cfg: AceStepConfig,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    *,
    cfg_ratio: float = 0.15,
    max_refs: int = 1,
) -> jax.Array:
    """Training loss for one batch.

    batch keys: target_latents (B,T,64), src_latents, chunk_masks (B,T,64),
    attention_mask (B,T), text_hidden_states/text_attention_mask,
    lyric_hidden_states/lyric_attention_mask, refer_packed/refer_order_mask,
    is_covers, silence_latent (1,T,64).
    """
    k_t, k_noise, k_drop = jax.random.split(key, 3)
    x0 = batch["target_latents"]
    b = x0.shape[0]

    enc, enc_mask, context_latents = dit.prepare_condition(
        params,
        cfg,
        text_hidden_states=batch["text_hidden_states"],
        text_attention_mask=batch["text_attention_mask"],
        lyric_hidden_states=batch["lyric_hidden_states"],
        lyric_attention_mask=batch["lyric_attention_mask"],
        refer_packed=batch["refer_packed"],
        refer_order_mask=batch["refer_order_mask"],
        src_latents=batch["src_latents"],
        chunk_masks=batch["chunk_masks"],
        is_covers=batch["is_covers"],
        attention_mask=batch.get("attention_mask"),
        silence_latent=batch["silence_latent"],
        max_refs=max_refs,
    )

    # CFG dropout: whole-sequence swap to the null condition embedding.
    drop = jax.random.uniform(k_drop, (b, 1, 1)) < cfg_ratio
    null = jnp.broadcast_to(params["null_condition_emb"].astype(enc.dtype), enc.shape)
    enc = jnp.where(drop, null, enc)

    t = sample_timesteps(k_t, b, cfg.timestep_mu, cfg.timestep_sigma).astype(jnp.float32)
    noise = jax.random.normal(k_noise, x0.shape, dtype=jnp.float32).astype(x0.dtype)
    t_ = t[:, None, None].astype(x0.dtype)
    xt = t_ * noise + (1.0 - t_) * x0

    cross_kvs = dit.precompute_cross_kv(params["decoder"], cfg, enc)
    v_pred = dit.dit_forward(
        params["decoder"],
        cfg,
        xt,
        t,
        t,
        context_latents,
        cross_kvs,
        encoder_mask=enc_mask,
        latent_mask=batch.get("attention_mask"),
    )
    flow = noise - x0
    err = (v_pred.astype(jnp.float32) - flow.astype(jnp.float32)) ** 2
    mask = batch.get("attention_mask")
    if mask is not None:
        m = mask.astype(jnp.float32)[:, :, None]
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)
    return jnp.mean(err)


@dataclasses.dataclass
class TrainState:
    params: Any  # trainable pytree (full params or LoRA factors)
    opt_state: Any
    step: int = 0


def create_train_state(
    trainable: Any,
    *,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    warmup_steps: int = 10,
    total_steps: int = 1000,
) -> Tuple[TrainState, optax.GradientTransformation]:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(sched, weight_decay=weight_decay),
    )
    return TrainState(trainable, tx.init(trainable)), tx


def make_train_step(
    cfg: AceStepConfig,
    tx: optax.GradientTransformation,
    *,
    lora_base: Optional[Any] = None,
    lora_alpha: float = 32.0,
    lora_rank: int = 32,
    cfg_ratio: float = 0.15,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step: ``step(params, opt_state, batch, key)``.

    Full-parameter mode (lora_base None): trainable = full model pytree.
    LoRA mode: trainable = LoRA factor dict; `lora_base` rides into the jitted
    program as an ARGUMENT on every call (closing over full model weights
    would bake multi-GB constants into the HLO upload) and the overlay is
    materialized inside jit (fused by XLA).
    """

    def loss_fn(trainable, base, batch, key):
        if base is not None:
            params = apply_lora(base, trainable, alpha=lora_alpha, rank=lora_rank)
        else:
            params = trainable
        return flow_matching_loss(params, cfg, batch, key, cfg_ratio=cfg_ratio)

    def _step(state_params, opt_state, base, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state_params, base, batch, key)
        # Guard against non-finite grads (ref trainer.py:104-183 accounting):
        # skip the update when any grad is NaN/Inf.
        finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = tx.update(grads, opt_state, state_params)
        new_params = optax.apply_updates(state_params, updates)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_params, state_params
        )
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old) if hasattr(new, "shape") else new,
            new_opt,
            opt_state,
        )
        return new_params, new_opt, loss, finite

    jitted = jax.jit(_step, donate_argnums=(0, 1) if donate else ())

    def step(state_params, opt_state, batch, key):
        return jitted(state_params, opt_state, lora_base, batch, key)

    return step
