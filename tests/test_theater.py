"""Orchestrator: multi-turn character-consistent generation (tiny config)."""

import jax
import numpy as np
import pytest

from theatergen_tpu.config import tiny_config
from theatergen_tpu.db import CharacterDB
from theatergen_tpu.pipelines.bundle import init_bundle
from theatergen_tpu.theater import Theater
from theatergen_tpu.utils import parse


SPEC_T1 = {
    "prompt": "a knight and a dragon in a forest",
    "gen_boxes": [("a red knight", (50, 100, 150, 300)),
                  ("a green dragon", (300, 80, 180, 350))],
    "bg_prompt": "a forest clearing",
    "extra_neg_prompt": "",
    "obj_ids": [0, 1],
    # CMIGBench-style boxes author on a 512 canvas; without this the tiny
    # 16px render would normalize them off-canvas and degenerate every
    # guidance/composition mask
    "canvas_height": 512, "canvas_width": 512,
}
SPEC_T2 = {
    "prompt": "the knight rides toward a castle",
    "gen_boxes": [("a red knight", (200, 120, 160, 320))],
    "bg_prompt": "a castle road",
    "extra_neg_prompt": "blurry",
    "obj_ids": [0],
    "canvas_height": 512, "canvas_width": 512,
}


@pytest.fixture(scope="module")
def theater(tmp_path_factory):
    bundle = init_bundle(
        tiny_config(), jax.random.key(0),
        with_ip=True, with_controlnet=True, with_vision=True,
    )
    db = CharacterDB(str(tmp_path_factory.mktemp("chardb")))
    return Theater(bundle, db, num_steps=3)


def test_convert_spec():
    plan = parse.convert_spec(SPEC_T1, 512, 512)
    assert len(plan.object_plans) == 2
    # sorted by name: green dragon before red knight? "a green dragon" < "a red knight"
    assert plan.object_plans[0].phrase == "a green dragon"
    assert plan.object_plans[0].word == "dragon"
    assert plan.object_plans[0].prompt == "a forest clearing with a green dragon"
    assert "a forest clearing with" in plan.overall_prompt
    x0, y0, x1, y1 = plan.object_plans[1].box
    np.testing.assert_allclose([x0, y0, x1, y1],
                               [50 / 512, 100 / 512, 200 / 512, 400 / 512])


def test_pluralizer():
    assert parse.plural_noun("cat") == "cats"
    assert parse.plural_noun("box") == "boxes"
    assert parse.plural_noun("puppy") == "puppies"
    assert parse.plural_noun("wolf") == "wolves"
    assert parse.plural_noun("woman") == "women"
    assert parse.number_to_words(3) == "three"


def test_convert_spec_duplicate_grouping():
    spec = {
        "prompt": "two cats", "bg_prompt": "a room",
        "gen_boxes": [("a cat", (0, 0, 100, 100)), ("a cat", (200, 0, 100, 100))],
        "obj_ids": [0, 1],
    }
    plan = parse.convert_spec(spec, 512, 512)
    assert plan.overall_phrases[0][0] == "two cats"
    assert len(plan.overall_phrases[0][2]) == 2


def test_turn_one_generates_and_populates_db(theater):
    res = theater.run_turn(SPEC_T1, seed=0)
    H = theater.cfg.pipeline.height
    assert res.image.shape == (H, H, 3)
    assert np.isfinite(res.image).all()
    assert 0.0 <= res.image.min() and res.image.max() <= 1.0
    assert len(res.so_images) == 2
    # both characters persisted with embedding sidecars
    assert theater.db.has(0) and theater.db.has(1)
    assert theater.db.load_embedding(0) is not None
    assert res.seconds > 0


def test_turn_two_reuses_character_identity(theater):
    """Turn 2 must hit the DB for obj 0 (IP conditioning path)."""
    img_before = theater.db.load_image(0).copy()
    res = theater.run_turn(SPEC_T2, seed=1)
    assert res.image.shape[0] == theater.cfg.pipeline.height
    # DB hit must NOT overwrite the stored identity image
    np.testing.assert_array_equal(theater.db.load_image(0), img_before)


def test_turn_determinism(theater):
    r1 = theater.run_turn(SPEC_T2, seed=7)
    r2 = theater.run_turn(SPEC_T2, seed=7)
    np.testing.assert_array_equal(r1.image, r2.image)


def test_background_only_turn(theater):
    spec = {"prompt": "an empty beach", "gen_boxes": [],
            "bg_prompt": "an empty beach", "obj_ids": []}
    res = theater.run_turn(spec, seed=3)
    assert res.image.shape == (theater.cfg.pipeline.height,) * 2 + (3,)
    assert res.so_images == []


def test_turn_with_fast_schedule(tmp_path):
    """Fast schedules shorten the sampler; composition and the final pass
    must size from the actual schedule (code-review regression)."""
    import dataclasses

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.pipelines.bundle import init_bundle

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, num_steps=4, fast_after_steps=2, fast_rate=2))
    bundle = init_bundle(cfg, jax.random.key(0), with_ip=True,
                         with_controlnet=True, with_vision=True)
    t = Theater(bundle, CharacterDB(str(tmp_path)), num_steps=4)
    assert t.char_sched.num_steps < 4  # schedule actually subsampled
    res = t.run_turn(SPEC_T2, seed=0)
    assert np.isfinite(res.image).all()


def test_turn_with_cfg_cutoff(tmp_path):
    """cfg_cutoff_fraction wires from PipelineConfig through both the
    character and final pipelines and still yields a finite image."""
    import dataclasses

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.pipelines.bundle import init_bundle

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, cfg_cutoff_fraction=0.5))
    bundle = init_bundle(cfg, jax.random.key(0), with_ip=True,
                         with_controlnet=True, with_vision=True)
    t = Theater(bundle, CharacterDB(str(tmp_path)), num_steps=4)
    res = t.run_turn(SPEC_T2, seed=0)
    assert np.isfinite(res.image).all()
    assert res.image.min() >= 0.0 and res.image.max() <= 1.0


def test_turn_with_deepcache(tmp_path):
    """deepcache_interval wires from PipelineConfig through both pipelines
    and still yields a finite, in-range image."""
    import dataclasses

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.pipelines.bundle import init_bundle

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, deepcache_interval=2))
    bundle = init_bundle(cfg, jax.random.key(0), with_ip=True,
                         with_controlnet=True, with_vision=True)
    t = Theater(bundle, CharacterDB(str(tmp_path)), num_steps=4)
    res = t.run_turn(SPEC_T2, seed=0)
    assert np.isfinite(res.image).all()
    assert res.image.min() >= 0.0 and res.image.max() <= 1.0


def test_turn_with_lcm_sampler(tmp_path):
    """scheduler_type='lcm' runs both pipelines guidance-free (cond-only,
    one UNet eval per step) through a full turn — the orchestrator path
    for LCM(-LoRA)-merged checkpoints (--scheduler lcm)."""
    import dataclasses

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.pipelines.bundle import init_bundle

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, scheduler_type="lcm"))
    bundle = init_bundle(cfg, jax.random.key(0), with_ip=True,
                         with_controlnet=True, with_vision=True)
    t = Theater(bundle, CharacterDB(str(tmp_path)), num_steps=4)
    res = t.run_turn(SPEC_T2, seed=0)
    assert np.isfinite(res.image).all()
    assert res.image.min() >= 0.0 and res.image.max() <= 1.0
    # turn 1 wrote obj 0 to the DB; runs 2 and 3 both take the DB-hit
    # (IP-conditioned) path and must agree bit-exactly
    r2 = t.run_turn(SPEC_T2, seed=0)
    r3 = t.run_turn(SPEC_T2, seed=0)
    np.testing.assert_array_equal(r2.image, r3.image)


def test_cfg_cutoff_steps_helper():
    from theatergen_tpu.ops.scheduler import cfg_cutoff_steps

    assert cfg_cutoff_steps(50, None) == 50
    assert cfg_cutoff_steps(50, 1.0) == 50
    assert cfg_cutoff_steps(50, 1.5) == 50
    assert cfg_cutoff_steps(50, 0.5) == 25
    assert cfg_cutoff_steps(50, 0.49) == 25   # ceil
    assert cfg_cutoff_steps(50, 0.0) == 1     # at least one CFG step
    assert cfg_cutoff_steps(3, 0.5) == 2


def test_overall_guidance_uses_plural_word(theater):
    """Duplicate objects pluralize in the overall prompt; guidance must
    anchor to the plural token, not fall back to position 1."""
    from theatergen_tpu.utils import parse as parse_mod
    from theatergen_tpu.utils.tokenizer import find_phrase_token_indices

    spec = {
        "prompt": "two cats", "bg_prompt": "a room",
        "gen_boxes": [("a cat", (50, 100, 100, 100)),
                      ("a cat", (300, 100, 100, 100))],
        "extra_neg_prompt": "", "obj_ids": [5, 6],
        "canvas_height": 512, "canvas_width": 512,
    }
    plan = parse_mod.convert_spec(spec, 512, 512)
    word = plan.overall_phrases[0][1]
    assert word == "cats"
    tp = find_phrase_token_indices(
        theater.bundle.tokenizer, plan.overall_prompt, word,
        theater.cfg.text.max_length)
    assert tp and tp != [1]
    # and the full turn still runs
    res = theater.run_turn(spec, seed=11)
    assert np.isfinite(res.image).all()


def test_turn_with_sam_masks(tmp_path):
    """Orchestrator with a SAM segmenter loaded: dual-scale mask branch."""
    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.pipelines.bundle import init_bundle

    bundle = init_bundle(tiny_config(), jax.random.key(0), with_ip=True,
                         with_controlnet=True, with_vision=True,
                         with_sam=True)
    t = Theater(bundle, CharacterDB(str(tmp_path)), num_steps=2)
    res = t.run_turn(SPEC_T2, seed=0)
    assert np.isfinite(res.image).all()
    # phase timers populated
    summary = t.timer.summary()
    assert summary["character"]["count"] >= 1
    assert "final" in summary


def test_batched_characters_with_sam_match_serial(tmp_path):
    """The batched character path segments the whole batch in ONE SAM
    program (segment_with_box_batch); images must match the serial
    per-character segmentation path."""
    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.pipelines.bundle import init_bundle

    bundle = init_bundle(tiny_config(), jax.random.key(0), with_ip=True,
                         with_controlnet=True, with_vision=True,
                         with_sam=True)
    serial = Theater(bundle, CharacterDB(str(tmp_path / "s")),
                     num_steps=2).run_turn(SPEC_T1, seed=0)
    batched = Theater(bundle, CharacterDB(str(tmp_path / "b")),
                      num_steps=2,
                      batch_characters=True).run_turn(SPEC_T1, seed=0)
    assert len(serial.so_images) == len(batched.so_images)
    np.testing.assert_allclose(batched.image, serial.image, atol=2e-3)


def test_turn_with_sam_hf_backend(tmp_path):
    """Orchestrator with the checkpoint-faithful SamHF segmenter (tiny):
    same dual-scale mask branch through the backend dispatch."""
    import dataclasses

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.perception.sam_hf import SamHF
    from theatergen_tpu.pipelines.bundle import init_bundle

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, sam=dataclasses.replace(cfg.sam, backend="hf"))
    bundle = init_bundle(cfg, jax.random.key(0), with_ip=True,
                         with_vision=True, with_sam=True)
    assert isinstance(bundle.sam, SamHF)
    t = Theater(bundle, CharacterDB(str(tmp_path)), num_steps=2)
    res = t.run_turn(SPEC_T2, seed=0)
    assert np.isfinite(res.image).all()


def test_turn_with_gdino_detector(tmp_path):
    """Orchestrator with a GroundingDINO detector backend plugged into
    detect-and-regenerate (bundle.detector, reference
    utils/detector.py:5-21)."""
    import jax.numpy as jnp

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.perception.gdino import (
        GroundingDinoBackend, GroundingDinoForDetection, prepare_text_inputs,
        tiny_gdino_config,
    )
    from theatergen_tpu.pipelines.bundle import init_bundle

    gcfg = tiny_gdino_config()
    gm = GroundingDinoForDetection(gcfg)
    ids = np.array([[101, 5, 6, 1012, 102]], np.int64)
    mask, pos = prepare_text_inputs(ids)
    gparams = gm.init(jax.random.key(0),
                      np.zeros((1, gcfg.image_size, gcfg.image_size, 3),
                               np.float32), ids, mask, pos)["params"]

    class _Tok:
        cls, sep, unk = 101, 102, 100
        vocab = {".": 1012}

        def encode(self, text):
            ids = [self.cls]
            for t in text.split():
                ids.append(1012 if t == "." else (hash(t) % 90) + 5)
            ids.append(self.sep)
            return ids

    backend = GroundingDinoBackend(gcfg, gparams, _Tok())
    # force detections to succeed so the turn takes the detector's box
    backend.BOX_THRESHOLD = -1.0

    bundle = init_bundle(tiny_config(), jax.random.key(0), with_ip=True,
                         with_vision=True)
    bundle.detector = backend
    t = Theater(bundle, CharacterDB(str(tmp_path)), num_steps=2)
    res = t.run_turn(SPEC_T2, seed=0)
    assert np.isfinite(res.image).all()
    assert all(res.detections)

    # batched characters route detection through detect_batch (one GDINO
    # forward per turn) — must reproduce the serial turn
    serial = Theater(bundle, CharacterDB(str(tmp_path / "s")),
                     num_steps=2).run_turn(SPEC_T1, seed=0)
    batched = Theater(bundle, CharacterDB(str(tmp_path / "b")),
                      num_steps=2,
                      batch_characters=True).run_turn(SPEC_T1, seed=0)
    assert serial.detections == batched.detections
    np.testing.assert_allclose(batched.image, serial.image, atol=2e-3)


def test_ema_update():
    from theatergen_tpu.training.diffusion import ema_update

    import jax.numpy as jnp

    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-5)


def test_attn_transfer_per_step_default_and_differs(theater, tmp_path):
    """Default attention transfer is the reference's timestep-matched mode
    (utils/guidance.py:220-233); the aggregated mode is opt-in and changes
    the guided final pass."""
    assert theater.attn_transfer == "per_step"
    bundle = theater.bundle
    # frozen_step_ratio=0: at tiny scale the thresholded random-weight
    # attention masks union to the FULL canvas, and with frozen_steps >=
    # guidance_steps the per-step frozen replacement (reference
    # models/pipelines.py:833-834) bitwise-erases every guided latent —
    # correct semantics, but it would hide the ref-map difference this
    # test exists to observe.
    # guided=True explicitly: the ref-map semantics only reach the image
    # through the guided final pass (the default is now guided=False,
    # matching the reference's released behavior — BENCH_NOTES r5b)
    db_a = CharacterDB(str(tmp_path / "agg"))
    th_agg = Theater(bundle, db_a, num_steps=3, attn_transfer="aggregate",
                     guided=True)
    r_agg = th_agg.run_turn(SPEC_T1, seed=0, frozen_step_ratio=0.0)
    db_p = CharacterDB(str(tmp_path / "ps"))
    th_ps = Theater(bundle, db_p, num_steps=3, guided=True)
    r_ps = th_ps.run_turn(SPEC_T1, seed=0, frozen_step_ratio=0.0)
    # identical seeds/weights — only the ref-map semantics differ
    assert np.abs(r_ps.image - r_agg.image).max() > 1e-7


def test_batched_characters_match_serial(theater, tmp_path):
    """A turn's characters in ONE vmapped program (batch_characters=True)
    must reproduce the serial loop; with an 8-way dp mesh the batch
    shards over devices and must still match (VERDICT r1 §2)."""
    from theatergen_tpu.parallel.mesh import make_mesh

    bundle = theater.bundle
    th_s = Theater(bundle, CharacterDB(str(tmp_path / "s")), num_steps=3)
    r_s = th_s.run_turn(SPEC_T1, seed=0)
    assert not th_s.batch_characters

    th_b = Theater(bundle, CharacterDB(str(tmp_path / "b")), num_steps=3,
                   batch_characters=True)
    r_b = th_b.run_turn(SPEC_T1, seed=0)
    assert np.abs(r_s.image - r_b.image).max() < 2e-3
    for a, b in zip(r_s.so_images, r_b.so_images):
        assert np.abs(a - b).max() < 2e-3

    th_m = Theater(bundle, CharacterDB(str(tmp_path / "m")), num_steps=3,
                   mesh=make_mesh(dp=8, tp=1))
    r_m = th_m.run_turn(SPEC_T1, seed=0)
    assert np.abs(r_s.image - r_m.image).max() < 2e-3


def test_theater_pipelines_memoized(theater, tmp_path):
    """Theaters with identical settings share compiled pipelines through
    the bundle (the CLI builds one Theater per dialogue)."""
    th2 = Theater(theater.bundle, CharacterDB(str(tmp_path / "memo")),
                  num_steps=3)
    assert th2.char_run is theater.char_run
    assert th2.final_run is theater.final_run
    th3 = Theater(theater.bundle, CharacterDB(str(tmp_path / "memo2")),
                  num_steps=2)
    assert th3.char_run is not theater.char_run


def test_deferred_db_save_same_turn_hit(theater, tmp_path):
    """New-character DB writes are deferred past the final-pass dispatch
    (fetch overlaps the denoise); a SAME-turn lookup of the same obj_id
    with a different prompt must still be a hit, served from the pending
    on-device embedding (reference reads the DB file synchronously,
    models/pipelines.py:183-199 / write :476-477)."""
    from theatergen_tpu.db import CharacterDB
    from theatergen_tpu.theater import Theater

    db = CharacterDB(str(tmp_path / "defer"))
    saves = []
    orig = db.save
    db.save = lambda *a, **k: (saves.append(a[0]), orig(*a, **k))[1]
    th = Theater(theater.bundle, db, num_steps=3)
    spec = {
        "prompt": "a cat sits, then the same cat sleeps",
        "gen_boxes": [("a cat", (50, 100, 120, 120)),
                      ("a sleeping cat", (300, 100, 120, 120))],
        "bg_prompt": "a sunny room", "extra_neg_prompt": "",
        "obj_ids": [3, 3],
        "canvas_height": 512, "canvas_width": 512,
    }
    res = th.run_turn(spec, seed=0)
    assert np.isfinite(res.image).all()
    # one save (first appearance); the second was a pending-overlay hit
    assert saves == [3]
    assert db.has(3)
    assert not th._pending_saves          # flushed by turn end
    # next turn: the persisted character is a normal disk hit
    res2 = th.run_turn(SPEC_T2 | {"obj_ids": [3]}, seed=1)
    assert np.isfinite(res2.image).all()
    assert saves == [3]


def test_run_turn_wave_matches_serial(theater, tmp_path):
    """Dialogue-level DP (BASELINE config 4): N dialogues advance in
    lockstep with character AND final passes batched across dialogues,
    sharded over dp — must reproduce the serial per-dialogue loop.  A
    duplicate-obj_id dialogue exercises the in-wave serial fallback."""
    from theatergen_tpu.parallel.mesh import make_mesh
    from theatergen_tpu.theater import run_turn_wave

    bundle = theater.bundle
    spec_dup = {
        "prompt": "a cat sits beside a sleeping cat",
        "gen_boxes": [("a cat", (50, 100, 120, 120)),
                      ("a sleeping cat", (300, 100, 120, 120))],
        "bg_prompt": "a sunny room", "extra_neg_prompt": "",
        "obj_ids": [7, 7],
        "canvas_height": 512, "canvas_width": 512,
    }
    specs = [SPEC_T1, SPEC_T2, spec_dup]
    seeds = [0, 1, 2]

    serial = []
    for i, sp in enumerate(specs):
        th = Theater(bundle, CharacterDB(str(tmp_path / f"s{i}")),
                     num_steps=3)
        serial.append(th.run_turn(sp, seed=seeds[i]))

    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    ths = [Theater(bundle, CharacterDB(str(tmp_path / f"w{i}")),
                   num_steps=3, mesh=mesh) for i in range(len(specs))]
    wave = run_turn_wave(ths, specs, seeds)

    assert len(wave) == len(specs)
    for s, wv in zip(serial, wave):
        assert np.abs(s.image - wv.image).max() < 2e-3
        assert len(s.so_images) == len(wv.so_images)
        assert s.detections == wv.detections


def test_wave_failure_clears_pending_saves(theater, tmp_path,
                                           monkeypatch):
    """A wave that dies after its character batch (e.g. in the batched
    final pass) must clear the deferred DB writes: the quarantine rerun
    would otherwise see a first-appearance character as a DB hit and
    flush the aborted wave's image as its canonical reference."""
    from theatergen_tpu import theater as theater_mod
    from theatergen_tpu.theater import run_turn_wave

    bundle = theater.bundle

    def boom(_th):
        raise RuntimeError("injected final-pass failure")

    monkeypatch.setattr(theater_mod, "_wave_final_runner", boom)
    ths = [Theater(bundle, CharacterDB(str(tmp_path / f"f{i}")),
                   num_steps=3) for i in range(2)]
    with pytest.raises(RuntimeError, match="injected"):
        run_turn_wave(ths, [SPEC_T1, SPEC_T2], [0, 1])
    for th, sp in zip(ths, [SPEC_T1, SPEC_T2]):
        assert not th._pending_saves
        assert not any(th.db.has(i) for i in sp["obj_ids"])
    monkeypatch.undo()

    # the serial rerun (the CLI quarantine path) now matches a clean run
    rerun = ths[0].run_turn(SPEC_T1, seed=0)
    clean = Theater(bundle, CharacterDB(str(tmp_path / "clean")),
                    num_steps=3).run_turn(SPEC_T1, seed=0)
    np.testing.assert_allclose(rerun.image, clean.image, atol=2e-4)


def test_wave_failure_carries_serial_fallback_results(theater, tmp_path,
                                                      monkeypatch):
    """A dialogue that completed via the in-wave serial fallback
    (duplicate obj_ids) must survive a batch failure: WaveFailure carries
    its TurnResult so quarantine handlers reuse it instead of re-running
    against its now-durable DB writes."""
    from theatergen_tpu import theater as theater_mod
    from theatergen_tpu.theater import WaveFailure, run_turn_wave

    bundle = theater.bundle
    spec_dup = {
        "prompt": "a cat sits beside a sleeping cat",
        "gen_boxes": [("a cat", (50, 100, 120, 120)),
                      ("a sleeping cat", (300, 100, 120, 120))],
        "bg_prompt": "a sunny room", "extra_neg_prompt": "",
        "obj_ids": [7, 7],
        "canvas_height": 512, "canvas_width": 512,
    }

    def boom(_th):
        raise RuntimeError("injected batch failure")

    monkeypatch.setattr(theater_mod, "_wave_final_runner", boom)
    ths = [Theater(bundle, CharacterDB(str(tmp_path / f"p{i}")),
                   num_steps=3) for i in range(2)]
    with pytest.raises(WaveFailure) as ei:
        run_turn_wave(ths, [spec_dup, SPEC_T1], [0, 1])
    # dialogue 0 fell back to serial inside the wave and completed
    assert list(ei.value.results) == [0]
    assert np.isfinite(ei.value.results[0].image).all()
    # dialogue 1's batch state was rolled back
    assert not ths[1]._pending_saves
    assert not any(ths[1].db.has(i) for i in SPEC_T1["obj_ids"])
    # ...but dialogue 0's serial DB writes are durable (its turn is done)
    assert ths[0].db.has(7)


def test_wave_serial_fallback_failure_rolls_back_db(theater, tmp_path):
    """If the in-wave serial fallback itself fails (duplicate-id dialogue)
    AFTER run_turn's finally flushed its character DB writes, the wave
    cleanup must delete those first-appearance ids — they never enter
    `jobs`, so the job-based rollback alone would miss them and the
    quarantine rerun would see a first appearance as a DB hit."""
    from theatergen_tpu.theater import WaveFailure, run_turn_wave

    bundle = theater.bundle
    spec_dup = {
        "prompt": "a cat sits beside a sleeping cat",
        "gen_boxes": [("a cat", (50, 100, 120, 120)),
                      ("a sleeping cat", (300, 100, 120, 120))],
        "bg_prompt": "a sunny room", "extra_neg_prompt": "",
        "obj_ids": [7, 7],
        "canvas_height": 512, "canvas_width": 512,
    }
    ths = [Theater(bundle, CharacterDB(str(tmp_path / f"g{i}")),
                   num_steps=3) for i in range(2)]

    def boom(*a, **k):
        # fires after character generation (deferred saves pending, then
        # flushed by run_turn's finally) but before the final pass
        assert ths[0]._pending_saves
        raise RuntimeError("injected fallback failure")

    ths[0]._final_stage = boom       # instance attr shadows the method
    with pytest.raises(WaveFailure) as ei:
        run_turn_wave(ths, [spec_dup, SPEC_T1], [0, 1])
    assert not ei.value.results      # the fallback dialogue did NOT finish
    assert not ths[0].db.has(7)      # its flushed write was rolled back
    del ths[0].__dict__["_final_stage"]

    rerun = ths[0].run_turn(spec_dup, seed=0)
    clean = Theater(bundle, CharacterDB(str(tmp_path / "gclean")),
                    num_steps=3).run_turn(spec_dup, seed=0)
    np.testing.assert_allclose(rerun.image, clean.image, atol=2e-4)


def test_wave_failure_after_db_flush_rolls_back(theater, tmp_path,
                                                monkeypatch):
    """On a real device an async final-pass error surfaces only at the
    trailing sync — AFTER _flush_db_saves persisted the wave's character
    images.  The failure handler must delete those first-appearance DB
    writes so the quarantine rerun starts from a clean miss."""
    from theatergen_tpu import theater as theater_mod
    from theatergen_tpu.theater import run_turn_wave

    bundle = theater.bundle
    ths = [Theater(bundle, CharacterDB(str(tmp_path / f"f{i}")),
                   num_steps=3) for i in range(2)]
    orig = theater_mod._sync_fetch

    def boom_after_flush(*arrays):
        # fires at the final-phase sync: by then the deferred DB writes
        # have been flushed (db.has is True), unlike the earlier
        # char/compose syncs
        if ths[0].db.has(SPEC_T1["obj_ids"][0]):
            raise RuntimeError("injected post-flush failure")
        return orig(*arrays)

    monkeypatch.setattr(theater_mod, "_sync_fetch", boom_after_flush)
    with pytest.raises(RuntimeError, match="post-flush"):
        run_turn_wave(ths, [SPEC_T1, SPEC_T2], [0, 1])
    monkeypatch.undo()
    for th, sp in zip(ths, [SPEC_T1, SPEC_T2]):
        assert not th._pending_saves
        assert not any(th.db.has(i) for i in sp["obj_ids"])

    rerun = ths[0].run_turn(SPEC_T1, seed=0)
    clean = Theater(bundle, CharacterDB(str(tmp_path / "clean")),
                    num_steps=3).run_turn(SPEC_T1, seed=0)
    np.testing.assert_allclose(rerun.image, clean.image, atol=2e-4)


def test_detect_agreement_harness(tmp_path, monkeypatch):
    """The agreement harness (scripts/detect_agreement.py, VERDICT r2 #5)
    runs end-to-end at tiny config and reports a well-formed table."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "detect_agreement",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "detect_agreement.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out, rows = mod.run(n=2, weights_dir=None, seed=0, num_steps=2)
    assert len(rows) == 2
    assert out["n"] == 2 and out["validated"] is False
    assert "caveat" in out
    for key in ("attn", "attn+clip"):
        assert 0.0 <= out["false_pass_vs_detector"][key] <= 1.0
        assert 0.0 <= out["agreement_with_detector"][key] <= 1.0
