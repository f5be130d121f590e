"""Data-parallel benchmark execution over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.11).  TPU-native
scaling: the DP unit is the *dialogue* (a dialogue's 4 turns are
sequentially dependent, ``generate.py:180-269``), and within a turn the
per-character generations are independent — so the character pipeline
``vmap``s over a character/dialogue batch and ``pjit`` shards that batch
axis over ``dp`` while params stay replicated (or tp-sharded via
:mod:`.mesh` rules).  One chip's benchmark loop becomes an SPMD program
over the slice; seeds fold in per batch element, preserving the
reproducibility contract.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..pipelines.bundle import Bundle
from ..pipelines.character import make_character_pipeline
from . import mesh as mesh_lib


def make_dp_character_runner(
    bundle: Bundle,
    num_steps: int,
    mesh,
    *,
    use_ip: bool = True,
    guided: bool = False,
    capture_ref_attn: bool = False,
    cfg_cutoff_fraction=None,
    deepcache_interval=None,
    with_extra_cond: bool = False,
):
    """Returns ``run(unet_params, latents [B,1,h,w,4], contexts [B,2,L,C],
    ip_scales [B], gins, rngs [B]) -> CharacterResult`` with B sharded
    over dp (params replicated or tp-sharded per the mesh rules).

    ``B`` must be a multiple of the dp axis size.  ``gins`` is a batched
    ``GuidanceInputs`` pytree (leading axis B) or None; ``rngs`` is a
    batched PRNG key array (used by stochastic samplers; pass
    ``jax.random.split(key, B)``).  With ``with_extra_cond`` the runner
    takes a trailing ``extra_conds`` pytree (leading axis B) of SDXL
    micro-conditioning (pooled_text/time_ids), so XL character batches
    work too.
    """
    run, sched = make_character_pipeline(
        bundle, num_steps, use_ip=use_ip, guided=guided,
        capture_ref_attn=capture_ref_attn,
        cfg_cutoff_fraction=cfg_cutoff_fraction,
        deepcache_interval=deepcache_interval,
    )

    gin_ax = 0 if guided or capture_ref_attn else None
    data = NamedSharding(mesh, P("dp"))
    gin_sh = data if guided or capture_ref_attn else None
    params_sharding = mesh_lib.param_shardings(
        mesh, bundle.unet_ip_params if use_ip else bundle.unet_params)
    if with_extra_cond:
        vrun = jax.vmap(
            lambda p, lat, ctx, scale, gin, rng, ec: run(
                p, lat, ctx, scale, gin, rng=rng, extra_cond=ec),
            in_axes=(None, 0, 0, 0, gin_ax, 0, 0),
        )
        shardings = (params_sharding, data, data, data, gin_sh, data, data)
    else:
        vrun = jax.vmap(
            lambda p, lat, ctx, scale, gin, rng: run(p, lat, ctx, scale,
                                                     gin, rng=rng),
            in_axes=(None, 0, 0, 0, gin_ax, 0),
        )
        shardings = (params_sharding, data, data, data, gin_sh, data)
    return jax.jit(vrun, in_shardings=shardings), sched


def fold_in_batch(rng: jax.Array, batch: int) -> jnp.ndarray:
    """Per-element RNG keys preserving the reference's per-seed
    reproducibility (``generate.py:236-243``)."""
    return jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(batch))


def make_dp_final_runner(
    bundle: Bundle,
    num_steps: int,
    mesh,
    *,
    use_ip: bool = True,
    use_controlnet: bool = True,
    guided: bool = True,
    cfg_cutoff_fraction=None,
    deepcache_interval=None,
    controlnet_interval=None,
    with_extra_cond: bool = False,
    with_adapter: bool = False,
):
    """Batched final passes (reference ``models/pipelines.py:592-857``) of
    D independent dialogues as ONE program, the dialogue axis sharded over
    dp.  Returns ``run(unet_params, controlnet_params, latents_all
    [D,S+1,1,h,w,4], frozen_mask [D,h,w], frozen_steps [D], context
    [D,2,L,C], cn_context [D,2,Lt,C], cond_image [D,H,W,3], ip_scale,
    gins, rngs [D]) -> final latents [D,1,h,w,4]`` (the per-step
    trajectory is dropped — the composed trajectory is an *input* here).

    ``with_extra_cond`` adds a trailing ``extra_conds`` pytree (leading
    axis D) of SDXL micro-conditioning; ``with_adapter`` adds
    ``adapter_featss`` (T2I-Adapter feature pyramids stacked on a leading
    D axis) — together they make XL/t2i dialogues wave-capable.

    ``D`` must be a multiple of the dp axis size.
    """
    from ..pipelines.final import make_final_pipeline

    run, sched = make_final_pipeline(
        bundle, num_steps, use_ip=use_ip, use_controlnet=use_controlnet,
        guided=guided, cfg_cutoff_fraction=cfg_cutoff_fraction,
        deepcache_interval=deepcache_interval,
        controlnet_interval=controlnet_interval,
    )

    def one(up, cp, lat_all, fm, fs, ctx, cn_ctx, cond, scale, gin, rng,
            ec, af):
        final, _traj = run(up, cp if use_controlnet else None, lat_all, fm,
                           fs, ctx, cn_ctx, cond, scale, gin, rng=rng,
                           extra_cond=ec, adapter_feats=af)
        return final

    ec_ax = 0 if with_extra_cond else None
    af_ax = 0 if with_adapter else None
    vrun = jax.vmap(
        one,
        in_axes=(None, None, 0, 0, 0, 0, 0, 0, None, 0, 0, ec_ax, af_ax),
    )
    data = NamedSharding(mesh, P("dp"))
    up_sh = mesh_lib.param_shardings(
        mesh, bundle.unet_ip_params if use_ip else bundle.unet_params)
    cp_sh = (mesh_lib.param_shardings(mesh, bundle.controlnet_params)
             if use_controlnet else None)
    jitted = jax.jit(
        vrun,
        in_shardings=(up_sh, cp_sh, data, data, data, data, data, data,
                      None, data, data,
                      data if with_extra_cond else None,
                      data if with_adapter else None),
    )

    def run_dp(up, cp, lat_all, fm, fs, ctx, cn_ctx, cond, scale, gin,
               rngs, extra_conds=None, adapter_featss=None):
        # batched inputs typically derive from the dp character runner's
        # sharded outputs — committed NamedSharding(mesh, P()) arrays that
        # jit's in_shardings refuses to reshard implicitly
        lat_all, fm, fs, ctx, cn_ctx, cond, gin, rngs = jax.device_put(
            (lat_all, fm, fs, ctx, cn_ctx, cond, gin, rngs), data)
        if extra_conds is not None:
            extra_conds = jax.device_put(extra_conds, data)
        if adapter_featss is not None:
            adapter_featss = jax.device_put(adapter_featss, data)
        return jitted(up, cp, lat_all, fm, fs, ctx, cn_ctx, cond, scale,
                      gin, rngs, extra_conds, adapter_featss)

    return run_dp, sched
