"""Sharded diffusion training step.

The reference is tuning-free at runtime, but its conditioning stack
(IP-Adapter ``to_k_ip/to_v_ip`` + ImageProjModel) is a *trained* artifact
(reference ``ip_adapter/ip_adapter.py:127-140`` loads those weights).  This
module provides the TPU-native trainer that produces/finetunes such
adapters: standard epsilon-prediction MSE over the DDPM forward process,
``pjit``-sharded over a ('dp','tp') mesh — dp shards the image batch, tp
shards attention/FFN projections per :mod:`..parallel.mesh`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import SchedulerConfig
from ..ops import scheduler as sched_ops
from ..parallel import mesh as mesh_lib


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2,
                   warmup: int = 100) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, decay_steps=100_000, end_value=lr * 0.1
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def diffusion_loss(
    unet_apply: Callable[..., jnp.ndarray],
    params: Any,
    sched: sched_ops.DDIMSchedule,
    latents: jnp.ndarray,     # [B, h, w, 4] clean (VAE-encoded) latents
    context: jnp.ndarray,     # [B, L, C]
    rng: jax.Array,
) -> jnp.ndarray:
    """ε-prediction MSE at uniformly sampled train timesteps."""
    b = latents.shape[0]
    t_rng, n_rng = jax.random.split(rng)
    t = jax.random.randint(t_rng, (b,), 0, sched.num_train_timesteps)
    noise = jax.random.normal(n_rng, latents.shape, latents.dtype)
    noisy = sched_ops.add_noise(sched, latents, noise, t)
    pred = unet_apply(params, noisy, t, context)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - noise))


def make_train_step(
    unet_apply: Callable[..., jnp.ndarray],
    optimizer: optax.GradientTransformation,
    scheduler_cfg: SchedulerConfig,
    *,
    trainable_filter: Optional[Callable[[str], bool]] = None,
):
    """Returns ``step(state, latents, context, rng) -> (state, loss)``.

    ``trainable_filter(path) -> bool`` freezes non-matching params (the
    IP-Adapter recipe: train only ``to_k_ip/to_v_ip`` + image_proj).
    Gradients for frozen leaves are zeroed — simple and shard-friendly.
    """
    sched = sched_ops.make_schedule(scheduler_cfg, scheduler_cfg.num_train_timesteps)

    def mask_grads(grads):
        if trainable_filter is None:
            return grads

        def one(path, g):
            pstr = "/".join(str(getattr(k, "key", k)) for k in path)
            return g if trainable_filter(pstr) else jnp.zeros_like(g)

        return jax.tree_util.tree_map_with_path(one, grads)

    def step(state: TrainState, latents, context, rng):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(unet_apply, p, sched, latents, context, rng)
        )(state.params)
        grads = mask_grads(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        # re-mask: decoupled weight decay would otherwise move frozen params
        updates = mask_grads(updates)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def ema_update(ema_params, params, decay: float = 0.9999):
    """Exponential moving average of params (standard diffusion training
    practice; apply after each train step, serve from the EMA tree)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def shard_train_step(step_fn, mesh):
    """jit the train step; param shardings come from the placed TrainState
    (``parallel.mesh.shard_params``), batch args are dp-sharded."""
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(None, data, data, None))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)
