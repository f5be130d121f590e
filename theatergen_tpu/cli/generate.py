"""CMIGBench generation driver.

Preserves the reference CLI's flag surface, seed discipline, resume and
output-tree contract (``generate.py:34-48,155-269``):

- flags: ``--task {story,editing}``, ``--repeats``, ``--regenerate``,
  ``--force_run_ind``, ``--seed_offset``, ``--sd_version``,
  ``--database_path_base``, ``--base_save_dir``, ``--dataset_path``,
  ``--frozen_step_ratio``, ``--freeze_dialogue_seed``;
- output tree ``{base_save_dir}/{task}/run{N}/{dialogue}/{turn}/img_{r}.png``
  (``generate.py:168,192,199``; ``utils/vis.py:244-264``);
- per-dialogue character DB ``{database_path_base}/{task}/{dialogue}/``
  (``generate.py:186-187``);
- resume-by-existence: a turn whose directory exists is skipped
  (``generate.py:193-194``);
- per-turn error quarantine: failures are logged and the turn skipped
  (``generate.py:250-259``);
- per-dialogue wall-clock timing with a running average
  (``generate.py:190,263-269``).

Seeds: the reference mixes LARGE_CONSTANT offsets into per-turn seeds
(``generate.py:157-160,236-243``); here the same reproducibility contract
is a deterministic hash of (seed_offset, dialogue-index-or-frozen-seed,
turn, repeat), so any (dialogue, turn, repeat) regenerates identically in
isolation.
"""

from __future__ import annotations

import argparse
import json
import os
import time
import traceback
from typing import Optional

import numpy as np


def turn_seed(seed_offset: int, dialogue_base: int, turn_idx: int,
              repeat: int, regen: int = 0) -> int:
    """Deterministic per-(regenerate-pass, dialogue, turn, repeat) seed;
    regenerate passes must see fresh randomness or deterministic failures
    can never self-heal (the reference advances seed_offset per pass,
    generate.py:157-160)."""
    return (seed_offset * 1_000_003 + regen * 7_919_997
            + dialogue_base * 10_007 + turn_idx * 101 + repeat) % (2**31 - 1)


def build_spec(turn_data: dict) -> dict:
    """CMIGBench turn dict → spec (``generate.py:205-226``)."""
    obj_ids, gen_boxes = [], []
    for bbox in turn_data.get("objects", []):
        gen_boxes.append((bbox[0], tuple(bbox[1])))
        obj_ids.append(bbox[2])
    return {
        "prompt": turn_data["caption"],
        "gen_boxes": gen_boxes,
        "bg_prompt": turn_data.get("background", ""),
        "extra_neg_prompt": turn_data.get("negative", ""),
        "obj_ids": obj_ids,
    }


def save_image(path: str, image: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8)).save(path)


def make_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TheaterGen-TPU benchmark driver")
    ap.add_argument("--task", default="story", choices=["story", "editing"])
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--regenerate", type=int, default=1)
    ap.add_argument("--force_run_ind", type=int, default=0)
    ap.add_argument("--seed_offset", type=int, default=0)
    ap.add_argument("--sd_version", default="1.5", choices=["1.5", "xl"])
    ap.add_argument("--database_path_base", default="database")
    ap.add_argument("--base_save_dir", default="img_generations")
    ap.add_argument("--dataset_path", default="CMIGBench")
    ap.add_argument("--frozen_step_ratio", type=float, default=0.5)
    ap.add_argument("--freeze_dialogue_seed", type=int, default=None)
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random-weight config (smoke runs, no ckpts)")
    ap.add_argument("--box_canvas", type=int, default=None,
                    help="authoring canvas of the dataset's pixel boxes "
                         "(CMIGBench: 512). Defaults to the render size "
                         "(reference behavior); --tiny defaults to 512 so "
                         "512-authored boxes stay meaningful at 16px")
    ap.add_argument("--weights", default=None,
                    help="directory of ported checkpoints (models/weights.py)")
    ap.add_argument("--snapshot", default=None, metavar="DIR",
                    help="bundle snapshot dir (models/snapshot.py): load "
                         "from it when present, else save one after the "
                         "bundle is built — later runs cold-start fast")
    ap.add_argument("--guidance", action="store_true",
                    help="enable the latent-guidance energy loop (the "
                         "reference ships it dormant; costs ~2.8x per "
                         "dialogue on chip — BENCH_NOTES r5b)")
    ap.add_argument("--no_guidance", action="store_true",
                    help="(deprecated: guidance is off by default; kept "
                         "so round-4 command lines keep working)")
    ap.add_argument("--cfg_cutoff", type=float, default=None,
                    help="CFG truncation fraction: full CFG for the first "
                         "frac of steps, cond-only after (~2x faster tail)")
    ap.add_argument("--deepcache", type=int, default=None,
                    help="DeepCache interval: full UNet every N-th step, "
                         "shallow blocks + cached deep feature in between")
    ap.add_argument("--cn_interval", type=int, default=None,
                    help="final pass: ControlNet forward every N-th step, "
                         "residuals reused in between")
    ap.add_argument("--scheduler", default=None,
                    choices=["ddim", "euler_ancestral", "lcm"],
                    help="override the sampler; 'lcm' is the guidance-free "
                         "few-step loop for LCM(-LoRA)-merged checkpoints "
                         "(pair with --num_steps 4-8)")
    ap.add_argument("--prediction_type", default=None,
                    choices=["epsilon", "v_prediction", "sample"],
                    help="model output parameterization; epsilon is the "
                         "reference SD1.5 config, v_prediction covers "
                         "SD2.x-class and zero-SNR fine-tunes")
    ap.add_argument("--zero_snr", action="store_true", default=None,
                    help="rescale betas to zero terminal SNR "
                         "(arXiv 2305.08891; pair with v_prediction)")
    ap.add_argument("--mesh", default=None, metavar="dp=N[,tp=M]",
                    help="('dp','tp') device mesh: a turn's independent "
                         "character passes run as one vmapped program with "
                         "the batch sharded over dp and params tp-sharded "
                         "(the reference is single-GPU, generate.py:15)")
    ap.add_argument("--batch_chars", action="store_true",
                    help="batch a turn's character passes into one program "
                         "on a single device (implied by --mesh)")
    ap.add_argument("--dp_dialogues", type=int, default=None, metavar="N",
                    help="dialogue-level data parallelism: advance N "
                         "dialogues in lockstep, batching each turn's "
                         "character AND final passes into single programs "
                         "sharded over the --mesh dp axis (BASELINE config "
                         "4; the reference runs one dialogue at a time, "
                         "generate.py:180-269)")
    ap.add_argument("--max_dialogues", type=int, default=None)
    ap.add_argument("--profile", action="store_true",
                    help="emit a jax.profiler trace for the first dialogue")
    return ap


def load_dataset(dataset_path: str, task: str) -> dict:
    path = os.path.join(dataset_path, f"{task}.json")
    with open(path) as f:
        return json.load(f)


def apply_pipeline_overrides(cfg, *, cfg_cutoff=None, deepcache=None,
                             scheduler=None, cn_interval=None,
                             prediction_type=None, zero_snr=None):
    """One place for the CLI/bench pipeline-knob overrides so every
    entry point accepts the same set."""
    if (cfg_cutoff is None and deepcache is None and scheduler is None
            and cn_interval is None and prediction_type is None
            and zero_snr is None):
        return cfg
    import dataclasses

    pl = cfg.pipeline
    if cfg_cutoff is not None:
        pl = dataclasses.replace(pl, cfg_cutoff_fraction=cfg_cutoff)
    if deepcache is not None:
        pl = dataclasses.replace(pl, deepcache_interval=deepcache)
    if scheduler is not None:
        pl = dataclasses.replace(pl, scheduler_type=scheduler)
    if cn_interval is not None:
        pl = dataclasses.replace(pl, controlnet_interval=cn_interval)
    cfg = dataclasses.replace(cfg, pipeline=pl)
    if prediction_type is not None or zero_snr is not None:
        sc = cfg.scheduler
        if prediction_type is not None:
            sc = dataclasses.replace(sc, prediction_type=prediction_type)
        if zero_snr is not None:
            sc = dataclasses.replace(sc, rescale_zero_terminal_snr=zero_snr)
        cfg = dataclasses.replace(cfg, scheduler=sc)
    return cfg


def build_theater(args):
    import jax

    from ..config import sd15_config, tiny_config
    from ..db import CharacterDB  # noqa: F401  (used by caller)
    from ..pipelines.bundle import init_bundle
    from ..utils.fastinit import setup_compile_cache

    setup_compile_cache()
    if args.tiny:
        from ..config import tiny_xl_config

        cfg = tiny_xl_config() if args.sd_version == "xl" else tiny_config()
    elif args.sd_version == "xl":
        from ..config import sdxl_config

        cfg = sdxl_config()
    else:
        cfg = sd15_config()
    cfg = apply_pipeline_overrides(
        cfg, cfg_cutoff=args.cfg_cutoff, deepcache=args.deepcache,
        scheduler=args.scheduler, cn_interval=args.cn_interval,
        prediction_type=getattr(args, "prediction_type", None),
        zero_snr=getattr(args, "zero_snr", None))
    is_xl = args.sd_version == "xl"
    snap = getattr(args, "snapshot", None)
    if snap and os.path.exists(os.path.join(snap, "bundle_meta.json")):
        from ..models.snapshot import load_bundle_snapshot

        print(f"loading bundle snapshot: {snap}")
        return load_bundle_snapshot(cfg, snap,
                                    tokenizer_assets=args.weights or None)
    if args.weights:
        from ..models.weights import load_bundle

        bundle = load_bundle(cfg, args.weights)
    else:
        bundle = init_bundle(
            cfg, jax.random.key(0),
            with_ip=True, with_controlnet=not is_xl, with_vision=True,
            with_t2i_adapter=is_xl,
        )
    if snap:
        from ..models.snapshot import save_bundle_snapshot

        save_bundle_snapshot(bundle, snap)
        print(f"bundle snapshot saved: {snap} (next run loads it directly)")
    return bundle


def parse_mesh_arg(spec: Optional[str]):
    """'dp=N[,tp=M]' → jax.sharding.Mesh (None passes through)."""
    if not spec:
        return None
    from ..parallel import mesh as mesh_lib

    kw = {"dp": 1, "tp": 1}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in kw:
            raise SystemExit(f"--mesh: unknown axis {k!r} (use dp=N[,tp=M])")
        kw[k] = int(v)
    import jax

    n = kw["dp"] * kw["tp"]
    if n > len(jax.devices()):
        raise SystemExit(
            f"--mesh {spec}: needs {n} devices, have {len(jax.devices())}")
    return mesh_lib.make_mesh(dp=kw["dp"], tp=kw["tp"],
                              devices=jax.devices()[:n])


def _run_wave_mode(args, bundle, mesh, dataset, dialogues, save_dir,
                   log) -> None:
    """Dialogue-level DP: waves of ``--dp_dialogues`` dialogues advance
    turn-by-turn in lockstep through batched character/final programs
    (theater.run_turn_wave — BASELINE config 4).  Seeds, resume, output
    tree and quarantine match the serial loop exactly."""
    from ..db import CharacterDB
    from ..theater import Theater, run_turn_wave

    W = args.dp_dialogues
    canvas = args.box_canvas or (512 if args.tiny else None)
    use_time = []
    profiled = False
    for regen_ind in range(args.regenerate):
        for w0 in range(0, len(dialogues), W):
            wave = dialogues[w0:w0 + W]
            theaters = []
            for dialogue in wave:
                db = CharacterDB(os.path.join(
                    args.database_path_base, args.task, str(dialogue)))
                theaters.append(Theater(
                    bundle, db, task=args.task, num_steps=args.num_steps,
                    guided=args.guidance and not args.no_guidance, mesh=mesh,
                    batch_characters=True))
            t0 = time.time()
            for t_idx in range(4):
                turn = f"turn {t_idx + 1}"
                sel, specs = [], []
                for i, dialogue in enumerate(wave):
                    turn_dir = os.path.join(save_dir, str(dialogue), turn)
                    if os.path.exists(turn_dir):    # resume-by-existence
                        continue
                    if turn not in dataset[dialogue]:
                        continue
                    spec = build_spec(dataset[dialogue][turn])
                    if canvas:
                        spec["canvas_height"] = spec["canvas_width"] = canvas
                    sel.append(i)
                    specs.append(spec)
                if not sel:
                    continue
                for rep in range(args.repeats):
                    seeds = []
                    for i in sel:
                        base = (args.freeze_dialogue_seed
                                if args.freeze_dialogue_seed is not None
                                else w0 + i)
                        seeds.append(turn_seed(args.seed_offset, base,
                                               t_idx, rep,
                                               regen=regen_ind))
                    profile_ctx = None
                    if args.profile and not profiled:
                        from jax.profiler import trace

                        profile_ctx = trace(os.path.join(save_dir,
                                                         "profile"))
                        profile_ctx.__enter__()
                        profiled = True
                    try:
                        results = run_turn_wave(
                            [theaters[i] for i in sel], specs, seeds,
                            frozen_step_ratio=args.frozen_step_ratio)
                    except Exception as e:
                        # quarantine (generate.py:250-259): a wave failure
                        # falls back to per-dialogue serial turns so one
                        # bad dialogue can't sink its wave-mates.
                        # Dialogues the wave already completed (WaveFailure
                        # carries them) are reused, not re-run — their DB
                        # writes are durable and a rerun would diverge
                        traceback.print_exc()
                        partial = getattr(e, "results", {})
                        results = []
                        for w_idx, (i, spec, seed) in enumerate(
                                zip(sel, specs, seeds)):
                            if w_idx in partial:
                                results.append(partial[w_idx])
                                continue
                            try:
                                results.append(theaters[i].run_turn(
                                    spec, seed,
                                    frozen_step_ratio=args.frozen_step_ratio))
                            except Exception:
                                print(f"[quarantine] {wave[i]}/{turn} "
                                      f"rep {rep}:")
                                traceback.print_exc()
                                results.append(None)
                    finally:
                        if profile_ctx is not None:
                            profile_ctx.__exit__(None, None, None)
                            print("profiler trace: "
                                  f"{os.path.join(save_dir, 'profile')}")
                    for i, res in zip(sel, results):
                        if res is None:
                            continue
                        turn_dir = os.path.join(save_dir, str(wave[i]),
                                                turn)
                        save_image(os.path.join(turn_dir,
                                                f"img_{rep}.png"),
                                   res.image)
                        for j, so in enumerate(res.so_images):
                            save_image(os.path.join(
                                turn_dir, f"so_{rep}_{j}.png"), so)
                        log(event="turn", dialogue=str(wave[i]), turn=turn,
                            repeat=rep, seed=seeds[sel.index(i)],
                            seconds=round(res.seconds, 2),
                            characters=len(res.so_images),
                            detections=res.detections)
            dt = time.time() - t0
            use_time.append(dt / max(len(wave), 1))
            print(f"wave {wave}: {dt:.1f}s "
                  f"({dt / max(len(wave), 1):.1f}s/dialogue, p50 "
                  f"{np.median(use_time):.1f}s)")
            log(event="wave", dialogues=[str(d) for d in wave],
                seconds=round(dt, 2),
                phase_summary=theaters[0].timer.summary())
    if use_time:
        print(f"Total {len(use_time)} waves, avg {np.mean(use_time):.1f}s, "
              f"p50 {np.median(use_time):.1f}s per 4-turn dialogue")


def main(argv: Optional[list] = None) -> None:
    args = make_parser().parse_args(argv)
    from ..db import CharacterDB
    from ..theater import Theater

    bundle = build_theater(args)
    mesh = parse_mesh_arg(args.mesh)
    dataset = load_dataset(args.dataset_path, args.task)
    dialogues = list(dataset)
    if args.max_dialogues:
        dialogues = dialogues[: args.max_dialogues]

    save_dir = os.path.join(args.base_save_dir, args.task,
                            f"run{args.force_run_ind}")
    print(f"Save dir: {save_dir}")
    use_time = []
    # structured run log (the reference only print()s — SURVEY §5)
    os.makedirs(save_dir, exist_ok=True)
    run_log = open(os.path.join(save_dir, "run_log.jsonl"), "a")

    def log(**kw):
        run_log.write(json.dumps(kw) + "\n")
        run_log.flush()

    if args.dp_dialogues:
        _run_wave_mode(args, bundle, mesh, dataset, dialogues, save_dir,
                       log)
        run_log.close()
        return

    profiled = False
    for regen_ind in range(args.regenerate):
        for d_idx, dialogue in enumerate(dialogues):
            db = CharacterDB(os.path.join(
                args.database_path_base, args.task, str(dialogue)))
            theater = Theater(
                bundle, db, task=args.task, num_steps=args.num_steps,
                guided=args.guidance and not args.no_guidance, mesh=mesh,
                batch_characters=args.batch_chars,
            )
            base = (args.freeze_dialogue_seed
                    if args.freeze_dialogue_seed is not None else d_idx)
            profile_ctx = None
            if args.profile and not profiled:
                from ..utils.profiling import trace

                profile_ctx = trace(os.path.join(save_dir, "profile"))
                profile_ctx.__enter__()
                profiled = True
            t0 = time.time()
            for t_idx in range(4):
                turn = f"turn {t_idx + 1}"
                turn_dir = os.path.join(save_dir, str(dialogue), turn)
                if os.path.exists(turn_dir):
                    continue  # resume-by-existence (generate.py:193-194)
                if turn not in dataset[dialogue]:
                    continue
                spec = build_spec(dataset[dialogue][turn])
                canvas = args.box_canvas or (512 if args.tiny else None)
                if canvas:
                    spec["canvas_height"] = spec["canvas_width"] = canvas
                for rep in range(args.repeats):
                    seed = turn_seed(args.seed_offset, base, t_idx, rep,
                                     regen=regen_ind)
                    try:
                        res = theater.run_turn(
                            spec, seed,
                            frozen_step_ratio=args.frozen_step_ratio)
                    except Exception:
                        # error quarantine (generate.py:250-259)
                        print(f"[quarantine] {dialogue}/{turn} rep {rep}:")
                        traceback.print_exc()
                        continue
                    save_image(os.path.join(turn_dir, f"img_{rep}.png"),
                               res.image)
                    for i, so in enumerate(res.so_images):
                        save_image(os.path.join(turn_dir, f"so_{rep}_{i}.png"),
                                   so)
                    log(event="turn", dialogue=str(dialogue), turn=turn,
                        repeat=rep, seed=seed, seconds=round(res.seconds, 2),
                        characters=len(res.so_images),
                        detections=res.detections)
            if profile_ctx is not None:
                profile_ctx.__exit__(None, None, None)
                print(f"profiler trace: {os.path.join(save_dir, 'profile')}")
            dt = time.time() - t0
            use_time.append(dt)
            print(f"dialogue {dialogue}: {dt:.1f}s "
                  f"(avg {np.mean(use_time):.1f}s, p50 "
                  f"{np.median(use_time):.1f}s)")
            log(event="dialogue", dialogue=str(dialogue),
                seconds=round(dt, 2),
                phase_summary=theater.timer.summary())

    if use_time:
        print(f"Total {len(use_time)} dialogues, avg {np.mean(use_time):.1f}s,"
              f" p50 {np.median(use_time):.1f}s per 4-turn dialogue")
        log(event="summary", dialogues=len(use_time),
            avg_s=round(float(np.mean(use_time)), 2),
            p50_s=round(float(np.median(use_time)), 2))
    run_log.close()


if __name__ == "__main__":
    main()
