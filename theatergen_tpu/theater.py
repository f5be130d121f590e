"""The TheaterGen orchestrator: one turn → one character-consistent image.

Equivalent of the reference's ``theatergen.run`` (``theatergen.py:278-488``)
plus its helpers ``generate_single_object_with_box`` (``:43-201``) and
``get_masked_latents_all_list`` (``:204-273``), re-structured for TPU:

- every denoising phase is a pre-built jitted program (compiled once per
  shape); the host loop only handles dynamic character counts, the
  database, and the detect-regenerate control flow;
- per-character outputs (trajectory, masks, ref-attention) stay on device
  until composition, which is itself one jitted call over padded
  ``max_objects`` arrays;
- detection is attention-based by default (the word token's aggregated
  cross-attention — free, since the guidance keys are captured anyway),
  with SAM refinement when a segmenter is loaded, mirroring the
  reference's DINO→SAM chain (``theatergen.py:98-182``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .db import CharacterDB
from .ops import geometry as G
from .ops import latents as L
from .ops.lineart import dog_lineart
from .perception import detector as det
from .perception import sam as sam_lib
from .pipelines import sd
from .pipelines.bundle import Bundle
from .pipelines.character import (
    encode_ip_image, ip_context, make_character_pipeline, uncond_ip_features,
)
from .pipelines.final import make_final_pipeline
from .pipelines.guidance import GuidanceInputs
from .utils import parse
from .utils.profiling import PhaseTimer
from .utils.tokenizer import find_phrase_token_indices

MAX_REGEN_ATTEMPTS = 3          # theatergen.py:98-160 retries up to 3 seeds
ATTN_AGG_START = 10             # theatergen.py:30 attn_aggregation_step_start
MAX_PHRASE_TOKENS = 8           # fixed token-position pad (shape stability)


def _attn_mask_fallback(maps, hint, h: int, w: int, H: int, W: int):
    """Weightless character mask from aggregated guidance-key attention —
    the no-SAM fallback for :meth:`Theater._extract_masks` (serial) and
    its batched vmap (reference ``sam_refine_attn``'s role,
    ``models/sam.py:126-174``): strong attention anywhere, or moderate
    attention inside the detection-box hint."""
    agg = jnp.zeros((h, w), jnp.float32)
    for m in maps:
        mm = jnp.mean(m, axis=0)
        side = int(round(mm.shape[0] ** 0.5))
        agg = agg + G.resize_bilinear(mm.reshape(side, side), h, w)
    agg = agg / (jnp.max(agg) + 1e-8)
    box_m = G.box_mask(hint, h, w)
    m_lat = jnp.maximum((agg > 0.3).astype(jnp.float32),
                        box_m * (agg > 0.1))
    return m_lat, G.upsample_nearest(m_lat, H, W)


def _sync_fetch(*arrays) -> None:
    """Pull one element of each array to the host — an honest phase-timer
    sync (dependent-value fetch) that costs a single tiny round trip per
    array instead of a full transfer."""
    for a in arrays:
        np.asarray(a.ravel()[:1])


def _compose_program(lineart_module):
    """Alignment + trajectory composition + pixel collage + lineart +
    frozen mask as one XLA program. Module-level (closes over only the
    lineart module, keyed by its id in the bundle jit cache) so a shared
    bundle never pins a Theater instance through a bound method."""

    def run(lineart_params, traj, masks_lat, masks_pix, images, boxes,
            valid, bg_lat):
        traj_j, masks_j, _offsets = L.align_with_boxes(traj, masks_lat,
                                                       boxes)
        composed, fgi = L.compose_trajectories(traj_j, masks_j, bg_lat)
        collage, _union = L.collage_images(images, masks_pix, boxes, valid)
        if lineart_module is not None:
            # ported annotator (LineartDetector, generate.py:96)
            cond_img = lineart_module.apply(
                {"params": lineart_params}, collage[None])[0]
        else:
            cond_img = dog_lineart(collage)
        frozen_mask = (fgi > 0).astype(jnp.float32)  # theatergen.py:442-445
        return composed, collage, cond_img, frozen_mask

    return run


@dataclasses.dataclass
class TurnResult:
    image: np.ndarray                 # [H, W, 3] in [0, 1]
    so_images: List[np.ndarray]       # per-character renders
    collage: np.ndarray
    seconds: float
    detections: List[bool]


class Theater:
    def __init__(
        self,
        bundle: Bundle,
        db: CharacterDB,
        *,
        task: str = "story",
        num_steps: Optional[int] = None,
        # guided=False matches the reference's RELEASED behavior: it
        # defines latent_backward_guidance but its benchmark path never
        # invokes it (models/pipelines.py:62-128 dormant), and its
        # CMIGBench results are produced without it.  Chip data (r5b,
        # BENCH_NOTES): guided costs 2.8x per dialogue (47.0 s vs
        # 17.0 s steady state; char pass p50 4.2 s vs 1.3 s).  The
        # feature stays first-class — guided=True / --guidance opts in.
        guided: bool = False,
        use_controlnet: bool = True,
        attn_transfer: str = "per_step",
        mesh=None,
        batch_characters: bool = False,
    ):
        # "per_step": final-pass attention transfer matches each step's
        # saved reference attention (reference utils/guidance.py:220-233);
        # "aggregate": opt-in mean over steps >= ATTN_AGG_START.
        assert attn_transfer in ("per_step", "aggregate"), attn_transfer
        self.attn_transfer = attn_transfer
        # batched character mode: run a turn's independent character passes
        # as one vmapped program, sharded over the mesh's dp axis when a
        # ('dp','tp') mesh is given (the reference is strictly serial,
        # theatergen.py:396-407)
        self.mesh = mesh
        self.batch_characters = bool(batch_characters or mesh is not None)
        self.guided = guided
        self._char_run_b = None
        # obj_id -> (image [1,H,W,3] device, emb device): DB writes whose
        # host fetch is deferred past the final-pass dispatch
        self._pending_saves: Dict = {}
        assert bundle.unet_ip is not None, "bundle must be built with_ip=True"
        self.bundle = bundle
        self.db = db
        self.task = task
        cfg = bundle.cfg
        self.cfg = cfg
        self.num_steps = num_steps or cfg.pipeline.num_steps
        # SDXL backbone: dual text towers + micro-conditioning + T2I-Adapter
        # structure conditioning in place of ControlNet
        # (reference generate.py:103-133, models/pipelines.py:635-696)
        self.is_xl = cfg.unet.addition_embed_type == "text_time"
        self.use_t2i = self.is_xl and bundle.t2i_adapter is not None
        self.use_controlnet = (use_controlnet and not self.use_t2i
                               and bundle.controlnet is not None)

        # memoized on the bundle: Theaters with identical settings (the
        # CLI builds one per dialogue) share ONE compiled pipeline
        pl = cfg.pipeline
        base_key = (f"{id(cfg)}_{self.num_steps}_{guided}_"
                    f"{pl.cfg_cutoff_fraction}_{pl.deepcache_interval}")
        self.char_run, self.char_sched = bundle.memo(
            f"char_pipeline_{id(bundle.unet_ip)}_{base_key}",
            lambda: make_character_pipeline(
                bundle, self.num_steps, use_ip=True, guided=guided,
                capture_ref_attn=True,
                cfg_cutoff_fraction=pl.cfg_cutoff_fraction,
                deepcache_interval=pl.deepcache_interval,
            ))
        self.final_run, self.final_sched = bundle.memo(
            f"final_pipeline_{id(bundle.unet_ip)}_{id(bundle.controlnet)}_"
            f"{base_key}_{self.use_controlnet}_{pl.controlnet_interval}",
            lambda: make_final_pipeline(
                bundle, self.num_steps, use_ip=True,
                use_controlnet=self.use_controlnet, guided=guided,
                cfg_cutoff_fraction=pl.cfg_cutoff_fraction,
                deepcache_interval=pl.deepcache_interval,
                controlnet_interval=pl.controlnet_interval,
            ))
        self._decode = jax.jit(
            lambda vp, z: sd.decode_with(bundle.vae, vp,
                                         cfg.vae.scaling_factor, z))
        # static per sampler — fetching a device scalar costs a full tunnel
        # round-trip per character otherwise
        self._init_sigma = float(
            jax.device_get(self.char_sched.init_noise_sigma))
        # plus/full IP variants condition the uncond branch on black-image
        # features; computed once per Theater
        self._uncond_ip = uncond_ip_features(bundle)
        # per-phase wall-clock accounting (SURVEY §5: the reference only
        # times whole dialogues; timer.summary() gives p50/p90 per phase)
        self.timer = PhaseTimer()

    @staticmethod
    def so_prompt_for(task: str, phrase: str) -> str:
        """Single-object prompt template per task (reference
        ``models/pipelines.py:216-221``)."""
        if task == "story":
            return f"full-body picture of {phrase}"
        return f"single object, {phrase}"

    def _placeholder_ip_features(self) -> jnp.ndarray:
        """Zero/black conditioning features with the shape the active IP
        variant expects (base: [1, D_clip]; plus: [1, N, vision_hidden])."""
        if self._uncond_ip is not None:
            return self._uncond_ip
        return jnp.zeros((1, self.cfg.ip_adapter.clip_embeddings_dim))

    def _embed_from_db(self, emb: np.ndarray) -> jnp.ndarray:
        """DB-stored (flattened) features → variant-shaped [1, ...] array."""
        return self._embed_dev(jnp.asarray(np.asarray(emb)))

    def _embed_dev(self, emb: jnp.ndarray) -> jnp.ndarray:
        """Device features (any layout) → variant-shaped [1, ...] array,
        without a host round-trip."""
        if getattr(self.bundle, "ip_variant", "base") == "plus":
            hidden = self.cfg.vision.hidden_size
            return emb.reshape(1, -1, hidden)
        return emb.reshape(1, -1)

    # ---------------------------------------------------------------- utils

    def _encode_text(self, prompt, negative):
        """(context [2,L,C], extra_cond) — dual towers + pooled/time_ids
        for SDXL, single tower otherwise."""
        if not self.is_xl:
            return sd.encode_prompts(self.bundle, prompt, negative), None
        from .pipelines import sdxl as sdxl_mod

        ctx, pooled = sdxl_mod.encode_prompts_xl(self.bundle, prompt, negative)
        tids = sdxl_mod.default_time_ids(
            self.cfg.pipeline.height, self.cfg.pipeline.width, ctx.shape[0])
        return ctx, dict(pooled_text=pooled, time_ids=tids)

    def _decode_img(self, latents) -> jnp.ndarray:
        return self._decode(self.bundle.vae_params, latents)

    def _guidance_inputs(
        self, boxes: List[Tuple[float, float, float, float]],
        prompts_token_pos: List[List[int]],
        ref_attn: Optional[List[Tuple[jnp.ndarray, ...]]] = None,
    ) -> GuidanceInputs:
        """Pad per-object boxes/token-positions to max_objects.  The token
        axis pads to a FIXED width so every turn reuses one compiled
        program (variable padding would retrace the whole denoise scan)."""
        k = self.cfg.pipeline.max_objects
        p = MAX_PHRASE_TOKENS
        boxes_a = np.zeros((k, 4), np.float32)
        pos = np.zeros((k, p), np.int32)
        pos_valid = np.zeros((k, p), bool)
        valid = np.zeros((k,), bool)
        word = np.zeros((k,), np.int32)
        for i, (b, tp) in enumerate(zip(boxes, prompts_token_pos)):
            if i >= k:
                break
            boxes_a[i] = b
            for j, t in enumerate(tp[-p:]):
                pos[i, j] = t
                pos_valid[i, j] = True
            valid[i] = True
            word[i] = tp[-1] if tp else 0
        refs = None
        if ref_attn is not None:
            # per guidance key: [K, heads, HW] (aggregated, per-object maps
            # are [heads, HW]) or [S, K, heads, HW] (per-step, per-object
            # maps are [S, heads, HW] — reference timestep-matched transfer,
            # utils/guidance.py:220-233)
            num_keys = len(self.cfg.guidance.attn_keys)
            refs = []
            # stacked on device — fetching each map through the tunnel and
            # re-uploading costs a round trip per map
            for ki in range(num_keys):
                maps = []
                for i in range(k):
                    if i < len(ref_attn) and ref_attn[i] is not None:
                        maps.append(ref_attn[i][ki])
                    else:
                        maps.append(None)
                shape = next(m.shape for m in maps if m is not None)
                maps = [m if m is not None else jnp.zeros(shape, jnp.float32)
                        for m in maps]
                per_step = maps[0].ndim == 3
                refs.append(jnp.stack([m.astype(jnp.float32) for m in maps],
                                      axis=1 if per_step else 0))
            refs = tuple(refs)
        return GuidanceInputs(
            boxes=jnp.asarray(boxes_a), token_pos=jnp.asarray(pos),
            token_valid=jnp.asarray(pos_valid), obj_valid=jnp.asarray(valid),
            word_token=jnp.asarray(word), ref_attn_maps=refs,
        )

    def _aggregate_attn(self, ref_attn: Tuple[jnp.ndarray, ...]
                        ) -> List[jnp.ndarray]:
        """Mean guidance-key maps over steps >= ATTN_AGG_START
        (theatergen.py:30: aggregate the late, semantically-stable steps).
        Accepts [S, heads, HW] maps or batched [B, S, heads, HW] ones."""
        steps = self.char_sched.num_steps   # fast schedules shorten this
        start = min(ATTN_AGG_START, max(steps - 1, 0))
        batched = ref_attn[0].ndim == 4
        fn = self.bundle.jitted(
            f"agg_attn_{start}_{batched}",
            lambda maps: tuple(
                jnp.mean((m[:, start:] if batched else m[start:])
                         .astype(jnp.float32), axis=1 if batched else 0)
                for m in maps))
        return list(fn(tuple(ref_attn)))

    def _extract_masks(self, agg_maps, image, box_hint):
        """Character mask at latent + pixel scale: SAM when available,
        otherwise thresholded aggregated attention
        (reference sam_refine_attn, models/sam.py:126-174)."""
        h = self.cfg.pipeline.latent_height
        w = self.cfg.pipeline.latent_width
        H = self.cfg.pipeline.height
        W = self.cfg.pipeline.width
        if self.bundle.sam is not None:
            size = sam_lib.sam_input_size(self.bundle.sam)
            img_s = G.resize_bilinear(
                jnp.transpose(image[0], (2, 0, 1)), size, size
            )
            img_s = jnp.transpose(img_s, (1, 2, 0))
            (m_lat, m_pix), _conf = sam_lib.segment_with_box(
                self.bundle.sam, self.bundle.sam_params, img_s, box_hint,
                out_sizes=(h, H),
            )
            return m_lat, m_pix
        # attention fallback (one jitted program — eager jnp costs a
        # tunnel dispatch per op); key carries the baked sizes (bundle
        # jit-cache contract)
        return self.bundle.jitted(
            f"attn_masks_{h}_{w}_{H}_{W}",
            lambda maps, hint: _attn_mask_fallback(maps, hint, h, w, H, W),
        )(tuple(agg_maps), jnp.asarray(box_hint, jnp.float32))

    def _extract_masks_batched(self, agg_maps, images, box_hints):
        """Batched :meth:`_extract_masks`: masks for a whole character
        batch as ONE jitted program (one SAM forward / one vmapped
        attention-threshold program) instead of B eager ones."""
        h = self.cfg.pipeline.latent_height
        w = self.cfg.pipeline.latent_width
        H = self.cfg.pipeline.height
        W = self.cfg.pipeline.width
        sam = self.bundle.sam
        if sam is not None:
            size = sam_lib.sam_input_size(sam)

            def prog(params, imgs, boxes):
                imgs_s = jax.vmap(lambda im: jnp.transpose(
                    G.resize_bilinear(jnp.transpose(im, (2, 0, 1)),
                                      size, size), (1, 2, 0)))(imgs)
                (m_lat, m_pix), _conf = sam_lib.segment_with_box_batch(
                    sam, params, imgs_s, boxes, out_sizes=(h, H))
                return m_lat, m_pix

            return self.bundle.jitted(
                f"sam_masks_b_{id(sam)}_{h}_{H}", prog)(
                self.bundle.sam_params, images,
                jnp.asarray(box_hints, jnp.float32))

        return self.bundle.jitted(
            f"attn_masks_b_{h}_{w}_{H}_{W}",
            lambda maps, hints: jax.vmap(
                lambda *a: _attn_mask_fallback(a[:-1], a[-1], h, w, H, W)
            )(*maps, hints),
        )(tuple(agg_maps), jnp.asarray(box_hints, jnp.float32))

    # ---------------------------------------------------------- character

    def _character_prep(self, plan: parse.ObjectPlan, extra_neg: str) -> dict:
        """Host-side conditioning prep shared by the serial and batched
        character paths: prompts, token indices, text context, DB lookup →
        IP scale/embeds, guidance inputs (theatergen.py:43-96)."""
        b = self.bundle
        cfg = self.cfg
        centered = np.asarray(
            G.centered_box(jnp.asarray(plan.box, jnp.float32)))

        so_prompt = self.so_prompt_for(self.task, plan.phrase)
        neg = parse.DEFAULT_SO_NEGATIVE_PROMPT
        if extra_neg:
            neg = f"{extra_neg}, {neg}"

        with self.timer.phase("char.encode_text"):
            token_pos = find_phrase_token_indices(
                b.tokenizer, so_prompt, plan.word, cfg.text.max_length)
            if not token_pos:
                so_prompt = f"{so_prompt} | {plan.phrase}"  # guidance.py:33-36
                token_pos = find_phrase_token_indices(
                    b.tokenizer, so_prompt, plan.word, cfg.text.max_length)
            text_ctx, extra_cond = self._encode_text(so_prompt, neg)

        pending = self._pending_saves.get(plan.obj_id)
        if pending is not None:
            # a character saved earlier THIS turn whose disk write is still
            # deferred (see _character_finish): a hit, served from the
            # on-device embedding — no fetch, no disk read
            hit = True
            ip_scale = cfg.pipeline.ip_scale_hit
            img_embed = self._embed_dev(pending[1])
        elif (hit_t := self.db.lookup(plan.obj_id))[2]:
            db_img, db_emb, hit = hit_t
            if db_emb is None:
                db_emb = np.asarray(encode_ip_image(
                    b, jnp.asarray(db_img)[None])[0])
            ip_scale = cfg.pipeline.ip_scale_hit
            img_embed = self._embed_from_db(db_emb)
        else:
            hit = False
            # DB miss: placeholder features at IP scale 0 (reference uses a
            # placeholder model.png with scale 0, models/pipelines.py:183-199)
            ip_scale = 0.0
            img_embed = self._placeholder_ip_features()
        ctx = ip_context(b, text_ctx, img_embed, self._uncond_ip)
        gin = self._guidance_inputs([tuple(centered)], [token_pos])
        return dict(ctx=ctx, extra_cond=extra_cond, ip_scale=ip_scale,
                    img_embed=img_embed, gin=gin, token_pos=token_pos,
                    hit=hit, centered=centered)

    def _char_lat_fn(self):
        cfg = self.cfg
        # key carries the sampler's sigma: Theaters with different sampler
        # kinds can share one bundle (and thus the jit cache)
        return self.bundle.jitted(
            f"char_input_latents_{self._init_sigma}",
            lambda r0, r1, bx: L.input_latents_for_boxes(
                r0, r1, bx, cfg.pipeline.latent_height,
                cfg.pipeline.latent_width,
                fg_blending_ratio=cfg.pipeline.fg_blending_ratio,
                init_noise_sigma=self._init_sigma)[0][0])

    def _character_finish(self, plan: parse.ObjectPlan, prep: dict,
                          result, image, agg, detected_ok: bool,
                          det_box, masks=None) -> dict:
        """Masks + DB persistence + result dict, shared by both paths
        (theatergen.py:158-201, models/pipelines.py:476-477).  ``masks``
        carries (m_lat, m_pix) precomputed by the batched path."""
        b = self.bundle
        img_embed = prep["img_embed"]
        with self.timer.phase("char.masks"):
            m_lat, m_pix = (masks if masks is not None
                            else self._extract_masks(agg, image, det_box))
        if not prep["hit"]:
            with self.timer.phase("char.embed_db"):
                # dispatch CLIP-H on device; the fetch + disk write are
                # deferred to _flush_db_saves so they overlap the final
                # pass (the reference writes synchronously here,
                # models/pipelines.py:476-477 — same persistence, later)
                emb_dev = encode_ip_image(b, image)[0]
                self._pending_saves[plan.obj_id] = (image, emb_dev)
                img_embed = self._embed_dev(emb_dev)
        return dict(
            trajectory=result.trajectory, ref_attn=result.ref_attn,
            image=image, mask_lat=m_lat, mask_pix=m_pix,
            detected=detected_ok, token_pos=prep["token_pos"],
            img_embed=img_embed,
        )

    def _generate_character(self, plan: parse.ObjectPlan, extra_neg: str,
                            rng: jax.Array):
        """One character with detect-and-regenerate (theatergen.py:43-201)."""
        b = self.bundle
        prep = self._character_prep(plan, extra_neg)
        centered = prep["centered"]
        ctx, extra_cond = prep["ctx"], prep["extra_cond"]
        ip_scale, gin = prep["ip_scale"], prep["gin"]

        detected_ok = False
        result = image = None
        lat_fn = self._char_lat_fn()
        for attempt in range(MAX_REGEN_ATTEMPTS):
            arng = jax.random.fold_in(rng, attempt)
            init_lat = lat_fn(jax.random.fold_in(arng, 0),
                              jax.random.fold_in(arng, 1),
                              jnp.asarray(centered)[None])
            with self.timer.phase("char.denoise_decode"):
                result = self.char_run(
                    b.unet_ip_params, init_lat, ctx, jnp.float32(ip_scale),
                    gin, rng=jax.random.fold_in(arng, 7),
                    extra_cond=extra_cond)
                image = self._decode_img(result.latents)
                agg = self._aggregate_attn(result.ref_attn)
                # force one element to the host so the phase measures the
                # device chain, not just async dispatch (through the axon
                # tunnel block_until_ready can return early — a fetch of a
                # dependent value is the only honest sync)
                _sync_fetch(agg[0], image)
            with self.timer.phase("char.detect"):
                if self.bundle.detector is not None:
                    # external open-vocabulary detector (GroundingDINO-
                    # faithful backend) on the generated image, as the
                    # reference does (utils/detector.py:5-21)
                    detection = self.bundle.detector(image[0], plan.phrase)
                else:
                    detection = self.bundle.jitted(
                        "attn_detect",
                        lambda maps: det.attention_detect(list(maps), None),
                    )(tuple(agg))
                detected_ok = bool(detection.ok)
            if detected_ok:
                break
            # semantic self-healing: reseed and retry (theatergen.py:141-160)
        # `agg` from the last loop iteration is for the surviving `result`
        det_box = detection.box if detected_ok else jnp.asarray(centered)
        return self._character_finish(plan, prep, result, image, agg,
                                      detected_ok, det_box)

    def _batched_char_runner(self):
        """vmap+pjit character runner over the ('dp','tp') mesh (a 1-device
        mesh when none was given — pure program batching).  Built lazily;
        jit specializes per batch size."""
        if self._char_run_b is None:
            from .parallel import driver as dp_driver
            from .parallel import mesh as mesh_lib

            mesh = self.mesh
            if mesh is None:
                mesh = mesh_lib.make_mesh(dp=1, tp=1,
                                          devices=jax.devices()[:1])
            pl = self.cfg.pipeline
            self._char_run_b = self.bundle.memo(
                f"char_batched_{id(self.bundle.unet_ip)}_{id(self.cfg)}_"
                f"{self.num_steps}_{self.guided}_{pl.cfg_cutoff_fraction}_"
                f"{pl.deepcache_interval}_{self.is_xl}_"
                f"{tuple(mesh.shape.items())}",
                lambda: dp_driver.make_dp_character_runner(
                    self.bundle, self.num_steps, mesh, use_ip=True,
                    guided=self.guided, capture_ref_attn=True,
                    cfg_cutoff_fraction=pl.cfg_cutoff_fraction,
                    deepcache_interval=pl.deepcache_interval,
                    with_extra_cond=self.is_xl,
                )[0])
        return self._char_run_b

    def _generate_characters_batched(self, oplans, extra_neg: str,
                                     rng: jax.Array, indices) -> List[dict]:
        """All unique characters of a turn in ONE batched denoise program
        (sharded over dp when a mesh is set — VERDICT r1 §2/§5: the
        reference runs characters sequentially, theatergen.py:396-407;
        their passes are independent, so batch them).  Per-character seeds
        reproduce the serial path's fold-in discipline; detection failures
        fall back to the serial detect-and-regenerate loop."""
        return self._batched_char_exec(
            _make_char_jobs(self, oplans, extra_neg, rng, indices))

    def _batched_char_exec(self, jobs: List[dict]) -> List[dict]:
        """Run a list of character jobs — ``{th, oplan, prep, extra_neg,
        crng}`` — as ONE batched denoise program on this theater's runner.
        Jobs may come from several Theaters (``run_turn_wave`` batches
        across dialogues); every ``th`` must share this theater's bundle,
        mesh and pipeline settings.  Per-job masks/DB writes go through the
        owning theater; detection failures fall back to the owner's serial
        detect-and-regenerate loop."""
        b = self.bundle
        n = len(jobs)
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        B = -(-n // dp) * dp            # pad to a dp multiple
        pad = B - n

        lat_fn = self._char_lat_fn()
        init_lats, run_rngs = [], []
        for j in jobs:
            arng = jax.random.fold_in(j["crng"], 0)     # attempt 0
            init_lats.append(lat_fn(jax.random.fold_in(arng, 0),
                                    jax.random.fold_in(arng, 1),
                                    jnp.asarray(j["prep"]["centered"])[None]))
            run_rngs.append(jax.random.fold_in(arng, 7))

        stack = lambda xs: jnp.stack(list(xs) + [xs[0]] * pad)
        lats = stack(init_lats)
        ctxs = stack([j["prep"]["ctx"] for j in jobs])
        scales = jnp.asarray(
            [j["prep"]["ip_scale"] for j in jobs]
            + [jobs[0]["prep"]["ip_scale"]] * pad, jnp.float32)
        gins = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *([j["prep"]["gin"] for j in jobs]
                              + [jobs[0]["prep"]["gin"]] * pad))
        rngs = stack(run_rngs)
        args = [b.unet_ip_params, lats, ctxs, scales, gins, rngs]
        if self.is_xl:
            # SDXL micro-conditioning (pooled_text/time_ids) per character
            args.append(jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *([j["prep"]["extra_cond"] for j in jobs]
                  + [jobs[0]["prep"]["extra_cond"]] * pad)))

        with self.timer.phase("char.denoise_decode"):
            res = self._batched_char_runner()(*args)
            h, w = self.cfg.pipeline.latent_height, self.cfg.pipeline.latent_width
            images = self._decode(b.vae_params,
                                  res.latents.reshape(B, h, w, 4))
            aggs = self._aggregate_attn(res.ref_attn)   # per key [B,heads,HW]
            _sync_fetch(aggs[0], images)

        # detection for the whole batch as ONE program + ONE host sync
        # (the per-character loop costs B tunnel round trips on the bool
        # fetch alone); masks for the whole batch as one program too.
        # External backends without detect_batch stay per-image.
        det_b = masks_b = oks = None
        if b.detector is None:
            with self.timer.phase("char.detect"):
                det_b = b.jitted(
                    "attn_detect_b",
                    lambda maps: jax.vmap(
                        lambda *ms: det.attention_detect(list(ms), None)
                    )(*maps),
                )(tuple(aggs))
                oks = np.asarray(det_b.ok)
        elif hasattr(b.detector, "detect_batch"):
            with self.timer.phase("char.detect"):
                phrases = ([j["oplan"].phrase for j in jobs]
                           + [jobs[0]["oplan"].phrase] * pad)
                det_b = b.detector.detect_batch(images, phrases)
                oks = np.asarray(det_b.ok)
        if det_b is not None:
            with self.timer.phase("char.masks"):
                masks_b = self._extract_masks_batched(aggs, images,
                                                      det_b.box)

        outs = []
        for i, j in enumerate(jobs):
            th, oplan, prep = j["th"], j["oplan"], j["prep"]
            image = images[i][None]
            agg = [m[i] for m in aggs]
            masks = None
            if det_b is None:
                with th.timer.phase("char.detect"):
                    detection = b.detector(image[0], oplan.phrase)
                    detected_ok = bool(detection.ok)
                det_box = detection.box
            else:
                detected_ok = bool(oks[i])
                det_box = det_b.box[i]
                masks = (masks_b[0][i], masks_b[1][i])
            if not detected_ok:
                # rare path: rejoin the serial regen loop (same seeds —
                # attempt 0 is recomputed, then reseeded retries)
                outs.append(th._generate_character(
                    oplan, j["extra_neg"], j["crng"]))
                continue
            result = dataclasses.replace(
                res, latents=res.latents[i],
                trajectory=res.trajectory[i],
                ref_attn=tuple(m[i] for m in res.ref_attn))
            outs.append(th._character_finish(
                oplan, prep, result, image, agg, True, det_box,
                masks=masks))
        return outs

    # --------------------------------------------------------------- turn

    def _flush_db_saves(self) -> None:
        """Fetch + persist deferred character DB writes (see
        _character_finish).  Called mid-final for overlap and in
        run_turn's finally so the DB is always durable at turn end."""
        while self._pending_saves:
            obj_id = next(iter(self._pending_saves))
            image, emb = self._pending_saves.pop(obj_id)
            self.db.save(obj_id, np.asarray(image[0]),
                         np.asarray(emb).reshape(-1))

    def run_turn(self, spec: dict, seed: int,
                 frozen_step_ratio: Optional[float] = None,
                 overall_prompt_override: Optional[str] = None) -> TurnResult:
        """One turn → one image (reference theatergen.py:278-488)."""
        try:
            return self._run_turn(spec, seed, frozen_step_ratio,
                                  overall_prompt_override)
        finally:
            self._flush_db_saves()

    def _run_turn(self, spec: dict, seed: int,
                  frozen_step_ratio: Optional[float] = None,
                  overall_prompt_override: Optional[str] = None
                  ) -> TurnResult:
        t_start = time.time()
        b = self.bundle
        cfg = self.cfg
        plan = parse.convert_spec(spec, cfg.pipeline.height,
                                  cfg.pipeline.width)
        if overall_prompt_override and overall_prompt_override.strip():
            # reference theatergen.py:343-345
            plan.overall_prompt = overall_prompt_override.strip()
        extra_neg = spec.get("extra_neg_prompt") or ""
        ratio = (cfg.pipeline.frozen_step_ratio
                 if frozen_step_ratio is None else frozen_step_ratio)
        frozen_steps = min(int(round(ratio * self.num_steps)),
                           self.char_sched.num_steps)
        rng = jax.random.key(seed)

        # -- per-character generation with dedup (theatergen.py:217-226)
        order, unique_plans, unique_idx = _dedup_plans(plan)
        cache: Dict[Tuple[str, int], dict] = {k2: None for k2 in order}
        # batched mode needs distinct obj_ids: with duplicate ids the
        # serial path's first write becomes the second's DB hit (XL
        # micro-conds batch through the runner's extra_cond axis)
        use_batched = (
            self.batch_characters and unique_plans
            and (len(unique_plans) > 1 or self.mesh is not None)
            and len({p.obj_id for p in unique_plans}) == len(unique_plans))
        if use_batched:
            with self.timer.phase("character"):
                outs = self._generate_characters_batched(
                    unique_plans, extra_neg, rng, unique_idx)
            for oplan, out in zip(unique_plans, outs):
                cache[(oplan.prompt, oplan.obj_id)] = out
        else:
            for oplan, idx in zip(unique_plans, unique_idx):
                with self.timer.phase("character"):
                    cache[(oplan.prompt, oplan.obj_id)] = (
                        self._generate_character(
                            oplan, extra_neg, jax.random.fold_in(rng, idx)))
        chars = [cache[key] for key in order]

        k = cfg.pipeline.max_objects
        n = min(len(chars), k)
        if n == 0:
            # background-only turn: plain txt2img on the overall prompt
            ctx, extra_cond = self._encode_text(
                plan.overall_prompt or plan.bg_prompt,
                parse.DEFAULT_OVERALL_NEGATIVE_PROMPT)
            ctx = ip_context(b, ctx, self._placeholder_ip_features(),
                             self._uncond_ip)
            lat = sd.seeded_latents(jax.random.fold_in(rng, 99), 1,
                                    cfg.pipeline.latent_height,
                                    cfg.pipeline.latent_width)
            lat = lat * np.float32(self._init_sigma)
            res = self.char_run(b.unet_ip_params, lat, ctx, jnp.float32(0.0),
                                self._guidance_inputs([(0, 0, 1, 1)], [[1]]),
                                rng=jax.random.fold_in(rng, 98),
                                extra_cond=extra_cond)
            img = self._decode_img(res.latents)
            return TurnResult(np.asarray(img[0]), [], np.asarray(img[0]),
                              time.time() - t_start, [])

        fargs, collage = self._final_stage(plan, chars, extra_neg, rng)
        with self.timer.phase("final"):
            final, _traj = self.final_run(
                b.unet_ip_params,
                b.controlnet_params if self.use_controlnet else None,
                fargs["composed"], fargs["frozen_mask"],
                jnp.int32(frozen_steps), fargs["ctx"], fargs["cn_ctx"],
                fargs["cond_img"], jnp.float32(cfg.pipeline.ip_scale_final),
                fargs["gin"], rng=fargs["rng"],
                extra_cond=fargs["extra_cond"],
                adapter_feats=fargs["adapter_feats"])
            image = self._decode_img(final)
            # deferred DB writes land here: their embed programs precede
            # the final pass in the device queue, so the fetch+disk work
            # overlaps the final denoise instead of serializing before it
            self._flush_db_saves()
            _sync_fetch(image)          # honest phase timing (see above)

        return TurnResult(
            image=np.asarray(image[0]),
            so_images=[np.asarray(c["image"][0]) for c in chars],
            collage=np.asarray(collage),
            seconds=time.time() - t_start,
            detections=[bool(c["detected"]) for c in chars],
        )

    def _final_stage(self, plan, chars: List[dict], extra_neg: str,
                     rng: jax.Array):
        """Latent composition + final-pass conditioning for a turn whose
        characters are generated (theatergen.py:417-477).  Returns
        ``(fargs, collage)`` where ``fargs`` holds the final-run inputs —
        ``run_turn_wave`` stacks them across dialogues for the batched
        final runner."""
        b = self.bundle
        cfg = self.cfg
        k = cfg.pipeline.max_objects
        n = min(len(chars), k)
        # -- padded stacks for composition (stays on device — the reference
        # round-trips every trajectory through CPU, SURVEY §3.2)
        h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
        H, W = cfg.pipeline.height, cfg.pipeline.width
        # fast schedules shorten the sampler — size from it, not num_steps
        s1 = self.char_sched.num_steps + 1
        pad_n = k - n
        traj = jnp.stack(
            [chars[i]["trajectory"] for i in range(n)]
            + [jnp.zeros((s1, 1, h, w, 4))] * pad_n)
        masks_lat = jnp.stack(
            [chars[i]["mask_lat"] for i in range(n)]
            + [jnp.zeros((h, w))] * pad_n)
        masks_pix = jnp.stack(
            [chars[i]["mask_pix"] for i in range(n)]
            + [jnp.zeros((H, W))] * pad_n)
        images = jnp.stack(
            [chars[i]["image"][0] for i in range(n)]
            + [jnp.zeros((H, W, 3))] * pad_n)
        boxes = jnp.asarray(
            np.stack([plan.object_plans[i].box for i in range(n)]
                     + [np.zeros(4, np.float32)] * pad_n))
        valid = jnp.arange(k) < n

        # -- align to layout boxes, compose, collage: ONE jitted program
        # (eager jnp here costs a tunnel dispatch per op — measured ~0.6 s
        # of pure dispatch per turn before fusing)
        with self.timer.phase("compose"):
            bg_lat = sd.seeded_latents(
                jax.random.fold_in(rng, 1000), 1, h, w) * np.float32(
                    self._init_sigma)
            compose_fn = self.bundle.jitted(
                f"theater_compose_{id(self.bundle.lineart)}",
                _compose_program(self.bundle.lineart))
            composed, collage, cond_img, frozen_mask = compose_fn(
                self.bundle.lineart_params, traj, masks_lat, masks_pix,
                images, boxes, valid, bg_lat)
            _sync_fetch(frozen_mask)    # honest phase timing (see above)

        # -- overall context (+ ip embeds from the first character,
        #    models/pipelines.py:700-701)
        neg = parse.DEFAULT_OVERALL_NEGATIVE_PROMPT
        if extra_neg:
            neg = f"{extra_neg}, {neg}"
        # hardcoded final-pass suppression prefix (theatergen.py:363)
        neg = "incohesive, edge shadow, blurry, " + neg
        overall_ctx, extra_cond = self._encode_text(plan.overall_prompt, neg)
        ctx = ip_context(b, overall_ctx, chars[0]["img_embed"],
                         self._uncond_ip)
        adapter_feats = None
        if self.use_t2i:
            t2i_fn = b.jitted(
                f"t2i_adapter_{id(b.t2i_adapter)}",
                lambda tp, x: b.t2i_adapter.apply({"params": tp}, x))
            adapter_feats = t2i_fn(b.t2i_adapter_params, cond_img[None])

        # overall guidance: phrase token positions in the overall prompt.
        # Duplicate objects are pluralized there (convert_spec), so look up
        # each object's group word ('two cats' → 'cats'), not the singular.
        group_word = {}
        for phrase, word, bxs in plan.overall_phrases:
            for name in plan.objects:
                if name == phrase or parse.strip_article(name) in phrase:
                    group_word.setdefault(name, word)
        token_pos_all, boxes_all, refs = [], [], []
        for i, oplan in enumerate(plan.object_plans[:k]):
            word = group_word.get(oplan.phrase, oplan.word)
            tp = find_phrase_token_indices(
                b.tokenizer, plan.overall_prompt, word,
                cfg.text.max_length)
            token_pos_all.append(tp or [1])
            boxes_all.append(oplan.box)
            refs.append(chars[i]["ref_attn"])
        if self.attn_transfer == "per_step":
            # timestep-matched transfer (reference default): pass the full
            # [S, heads, HW] trajectories; guidance_update slices the step
            refs_in = refs
        else:
            refs_in = [tuple(self._aggregate_attn(r)) for r in refs]
        gin = self._guidance_inputs(boxes_all, token_pos_all, refs_in)

        return dict(
            composed=composed, frozen_mask=frozen_mask, ctx=ctx,
            # ControlNet sees text-only context
            cn_ctx=overall_ctx, cond_img=cond_img, gin=gin,
            extra_cond=extra_cond, adapter_feats=adapter_feats,
            rng=jax.random.fold_in(rng, 777),
        ), collage


def _dedup_plans(plan):
    """Within-turn character dedup (reference theatergen.py:217-226): a
    repeated (prompt, obj_id) reuses the first generation.  Returns
    (order keys, unique object plans, their spec indices)."""
    seen = set()
    order, unique_plans, unique_idx = [], [], []
    for idx, oplan in enumerate(plan.object_plans):
        key = (oplan.prompt, oplan.obj_id)
        order.append(key)
        if key not in seen:
            seen.add(key)
            unique_plans.append(oplan)
            unique_idx.append(idx)
    return order, unique_plans, unique_idx


def _make_char_jobs(th: "Theater", oplans, extra_neg: str, rng: jax.Array,
                    indices) -> List[dict]:
    """Character-job dicts for :meth:`Theater._batched_char_exec` — the
    one place the job shape and per-character seed fold-in discipline are
    defined (shared by the per-turn batched path and run_turn_wave)."""
    return [dict(th=th, oplan=p, extra_neg=extra_neg,
                 prep=th._character_prep(p, extra_neg),
                 crng=jax.random.fold_in(rng, idx))
            for p, idx in zip(oplans, indices)]


def _wave_final_runner(th: "Theater"):
    """Bundle-memoized batched final runner for run_turn_wave."""
    from .parallel import driver as dp_driver
    from .parallel import mesh as mesh_lib

    mesh = th.mesh
    if mesh is None:
        mesh = mesh_lib.make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    pl = th.cfg.pipeline
    return th.bundle.memo(
        f"final_batched_{id(th.bundle.unet_ip)}_{id(th.bundle.controlnet)}_"
        f"{id(th.cfg)}_{th.num_steps}_{th.guided}_{th.use_controlnet}_"
        f"{pl.cfg_cutoff_fraction}_{pl.deepcache_interval}_"
        f"{pl.controlnet_interval}_{th.is_xl}_{th.use_t2i}_"
        f"{tuple(mesh.shape.items())}",
        lambda: dp_driver.make_dp_final_runner(
            th.bundle, th.num_steps, mesh, use_ip=True,
            use_controlnet=th.use_controlnet, guided=th.guided,
            cfg_cutoff_fraction=pl.cfg_cutoff_fraction,
            deepcache_interval=pl.deepcache_interval,
            controlnet_interval=pl.controlnet_interval,
            with_extra_cond=th.is_xl, with_adapter=th.use_t2i)[0])


def run_turn_wave(theaters: List["Theater"], specs: List[dict],
                  seeds: List[int],
                  frozen_step_ratio: Optional[float] = None
                  ) -> List[TurnResult]:
    """Dialogue-level data parallelism (BASELINE config 4; SURVEY §2.11:
    the DP unit is the dialogue — its 4 turns are sequentially dependent,
    so N dialogues advance in lockstep one turn at a time).

    All character passes of the wave run as ONE batched denoise program
    and all final passes as another, each sharded over the lead theater's
    dp mesh axis (the reference processes dialogues strictly serially on
    one GPU, generate.py:180-269).  Theaters must share one bundle/mesh
    and settings; each keeps its own per-dialogue character DB.  XL/t2i
    bundles batch through the runners' extra_cond/adapter axes; duplicate
    obj_ids and background-only turns fall back to the owning theater's
    serial ``run_turn``.
    """
    assert len(theaters) == len(specs) == len(seeds)
    lead = theaters[0]
    results: Dict[int, TurnResult] = {}
    states, jobs = [], []

    try:
        # -- host prep + character jobs per dialogue (inside the try:
        # a later dialogue's prep error must still surface as WaveFailure
        # so completed serial-fallback results aren't discarded)
        for d, (th, spec, seed) in enumerate(zip(theaters, specs, seeds)):
            t0 = time.time()
            plan = parse.convert_spec(spec, th.cfg.pipeline.height,
                                      th.cfg.pipeline.width)
            extra_neg = spec.get("extra_neg_prompt") or ""
            rng = jax.random.key(seed)
            order, uplans, uidx = _dedup_plans(plan)
            distinct = len({p.obj_id for p in uplans}) == len(uplans)
            if not uplans or not distinct:
                # background-only turn, or same-id characters whose DB-hit
                # chain forces sequential generation.  If this serial
                # fallback itself fails, run_turn's finally has already
                # flushed its character DB writes — roll back the ids it
                # introduced (they are NOT in `jobs`, so the outer cleanup
                # won't see them) so the quarantine rerun starts clean
                pre_missing = [p.obj_id for p in plan.object_plans
                               if not th.db.has(p.obj_id)]
                try:
                    results[d] = th.run_turn(spec, seed, frozen_step_ratio)
                except BaseException:
                    for oid in pre_missing:
                        if th.db.has(oid):
                            th.db.delete(oid)
                    raise
                continue
            djobs = _make_char_jobs(th, uplans, extra_neg, rng, uidx)
            states.append(dict(d=d, th=th, plan=plan, extra_neg=extra_neg,
                               rng=rng, order=order, uplans=uplans,
                               jobs=djobs, t0=t0))
            jobs.extend(djobs)

        if not states:
            return [results[d] for d in range(len(theaters))]

        return _run_wave_body(lead, theaters, states, jobs, results,
                              frozen_step_ratio)
    except BaseException as e:
        # A failed batch must not leave DB writes behind: the quarantine
        # fallback (cli/generate.py, serve.py) reruns the failed turns
        # serially with the same seeds, and a stale entry would make
        # _character_prep treat a first appearance as a DB hit.  Two
        # forms to undo: (a) deferred _pending_saves, and (b) writes
        # already flushed to disk — on a real device an async final-pass
        # error only surfaces at the trailing _sync_fetch, AFTER
        # _flush_db_saves persisted the wave's character images (their
        # fetches depend only on the successful character program).
        # First-appearance ids (prep.hit == False) present in the DB now
        # were written by this wave — delete them, mirroring the
        # reference's delete-before-retry (theatergen.py:158-159).
        for st in states:
            st["th"]._pending_saves.clear()
        for j in jobs:
            if not j["prep"]["hit"] and j["th"].db.has(j["oplan"].obj_id):
                j["th"].db.delete(j["oplan"].obj_id)
        # dialogues that already completed via the in-wave serial
        # fallback (duplicate ids / background-only) have VALID results
        # and durable DB state — re-running them against that mutated DB
        # would diverge from a clean run.  Hand their results to the
        # quarantine so it only reruns the genuinely failed dialogues.
        if isinstance(e, Exception):
            raise WaveFailure(results, e) from e
        raise


class WaveFailure(RuntimeError):
    """A wave's batched programs failed.  ``results`` maps wave-local
    dialogue indices → TurnResult for dialogues that nonetheless completed
    (via the in-wave serial fallback); quarantine handlers must reuse
    these instead of re-running those dialogues (their DB writes are
    durable, so a rerun would see different DB-hit state)."""

    def __init__(self, results: Dict[int, "TurnResult"], cause):
        super().__init__(f"wave failed: {cause!r} "
                         f"({len(results)} dialogues completed serially)")
        self.results = results


def _run_wave_body(lead, theaters, states, jobs, results,
                   frozen_step_ratio):
    # -- ONE character batch across dialogues
    outs = lead._batched_char_exec(jobs)

    # -- per-dialogue composition + final-pass conditioning (host-light,
    # each a single jitted compose program)
    pos = 0
    for st in states:
        th = st["th"]
        couts = outs[pos:pos + len(st["jobs"])]
        pos += len(st["jobs"])
        cache = {(p.prompt, p.obj_id): o
                 for p, o in zip(st["uplans"], couts)}
        st["chars"] = [cache[k2] for k2 in st["order"]]
        st["fargs"], st["collage"] = th._final_stage(
            st["plan"], st["chars"], st["extra_neg"], st["rng"])
        ratio = (th.cfg.pipeline.frozen_step_ratio
                 if frozen_step_ratio is None else frozen_step_ratio)
        st["frozen"] = min(int(round(ratio * th.num_steps)),
                           th.char_sched.num_steps)

    # -- ONE batched final pass across dialogues
    D = len(states)
    dp = lead.mesh.shape["dp"] if lead.mesh is not None else 1
    B = -(-D // dp) * dp
    pad = B - D

    def stackf(key):
        xs = [st["fargs"][key] for st in states]
        return jnp.stack(xs + [xs[0]] * pad)

    gins = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *([st["fargs"]["gin"] for st in states]
          + [states[0]["fargs"]["gin"]] * pad))
    rngs = jnp.stack([st["fargs"]["rng"] for st in states]
                     + [states[0]["fargs"]["rng"]] * pad)
    frozen = jnp.asarray([st["frozen"] for st in states]
                         + [states[0]["frozen"]] * pad, jnp.int32)

    extra_conds = adapter_featss = None
    if lead.is_xl:
        extra_conds = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *([st["fargs"]["extra_cond"] for st in states]
              + [states[0]["fargs"]["extra_cond"]] * pad))
    if lead.use_t2i:
        adapter_featss = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *([st["fargs"]["adapter_feats"] for st in states]
              + [states[0]["fargs"]["adapter_feats"]] * pad))

    with lead.timer.phase("final"):
        runner = _wave_final_runner(lead)
        finals = runner(
            lead.bundle.unet_ip_params,
            lead.bundle.controlnet_params if lead.use_controlnet else None,
            stackf("composed"), stackf("frozen_mask"), frozen,
            stackf("ctx"), stackf("cn_ctx"), stackf("cond_img"),
            jnp.float32(lead.cfg.pipeline.ip_scale_final), gins, rngs,
            extra_conds=extra_conds, adapter_featss=adapter_featss)
        h, w = (lead.cfg.pipeline.latent_height,
                lead.cfg.pipeline.latent_width)
        images = lead._decode(lead.bundle.vae_params,
                              finals.reshape(B, h, w, 4))
        # deferred DB writes overlap the batched final (see Theater
        # _flush_db_saves)
        for st in states:
            st["th"]._flush_db_saves()
        _sync_fetch(images)

    for i, st in enumerate(states):
        results[st["d"]] = TurnResult(
            image=np.asarray(images[i]),
            so_images=[np.asarray(c["image"][0]) for c in st["chars"]],
            collage=np.asarray(st["collage"]),
            seconds=time.time() - st["t0"],
            detections=[bool(c["detected"]) for c in st["chars"]],
        )
    return [results[d] for d in range(len(theaters))]
