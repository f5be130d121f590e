"""CLI driver: output-tree contract, resume, seeds."""

import json
import os

import numpy as np
import pytest

from theatergen_tpu.cli import generate as cli


def test_turn_seed_deterministic_and_distinct():
    s1 = cli.turn_seed(0, 3, 1, 0)
    assert s1 == cli.turn_seed(0, 3, 1, 0)
    seeds = {cli.turn_seed(0, d, t, r)
             for d in range(3) for t in range(4) for r in range(2)}
    assert len(seeds) == 24  # no collisions in a small grid


def test_build_spec_matches_reference_contract():
    turn = {
        "caption": "a cat and a dog",
        "background": "a room",
        "negative": "blurry",
        "objects": [["a cat", [10, 20, 30, 40], 0],
                    ["a dog", [50, 60, 70, 80], 1]],
    }
    spec = cli.build_spec(turn)
    assert spec["prompt"] == "a cat and a dog"
    assert spec["gen_boxes"] == [("a cat", (10, 20, 30, 40)),
                                 ("a dog", (50, 60, 70, 80))]
    assert spec["obj_ids"] == [0, 1]
    assert spec["extra_neg_prompt"] == "blurry"


@pytest.mark.slow
def test_cli_end_to_end_tiny(tmp_path):
    """Full driver run on one dialogue: tree layout + resume behavior."""
    dataset = {
        "d0": {
            "turn 1": {"caption": "a cat", "background": "a room",
                       "negative": "",
                       "objects": [["a cat", [100, 100, 200, 200], 0]]},
            "turn 2": {"caption": "the cat again", "background": "a room",
                       "negative": "",
                       "objects": [["a cat", [150, 150, 200, 200], 0]]},
        }
    }
    ds_dir = tmp_path / "ds"
    ds_dir.mkdir()
    (ds_dir / "story.json").write_text(json.dumps(dataset))
    save = tmp_path / "out"
    db = tmp_path / "db"
    argv = ["--tiny", "--dataset_path", str(ds_dir), "--num_steps", "2",
            "--base_save_dir", str(save), "--database_path_base", str(db)]
    cli.main(argv)
    img = save / "story" / "run0" / "d0" / "turn 1" / "img_0.png"
    assert img.exists()
    assert (save / "story" / "run0" / "d0" / "turn 2" / "img_0.png").exists()
    assert (db / "story" / "d0").exists()
    # resume-by-existence: a second run must not rewrite existing turns
    mtime = os.path.getmtime(img)
    cli.main(argv)
    assert os.path.getmtime(img) == mtime


def test_cli_cfg_cutoff_flag():
    args = cli.make_parser().parse_args(["--tiny", "--cfg_cutoff", "0.5"])
    assert args.cfg_cutoff == 0.5
    bundle = cli.build_theater(args)
    assert bundle.cfg.pipeline.cfg_cutoff_fraction == 0.5


def test_cli_deepcache_flag():
    args = cli.make_parser().parse_args(["--tiny", "--deepcache", "2"])
    assert args.deepcache == 2
    bundle = cli.build_theater(args)
    assert bundle.cfg.pipeline.deepcache_interval == 2
    assert bundle.cfg.pipeline.cfg_cutoff_fraction is None


@pytest.mark.slow
def test_cli_run_log(tmp_path):
    dataset = {"d0": {"turn 1": {
        "caption": "a cat", "background": "a room", "negative": "",
        "objects": [["a cat", [100, 100, 200, 200], 0]]}}}
    ds = tmp_path / "ds"; ds.mkdir()
    (ds / "story.json").write_text(json.dumps(dataset))
    cli.main(["--tiny", "--dataset_path", str(ds), "--num_steps", "2",
              "--base_save_dir", str(tmp_path / "o"),
              "--database_path_base", str(tmp_path / "db")])
    log_path = tmp_path / "o" / "story" / "run0" / "run_log.jsonl"
    lines = [json.loads(l) for l in log_path.read_text().splitlines()]
    events = [l["event"] for l in lines]
    assert "turn" in events and "dialogue" in events and "summary" in events
    turn = next(l for l in lines if l["event"] == "turn")
    assert turn["characters"] == 1 and turn["seconds"] > 0
    dlg = next(l for l in lines if l["event"] == "dialogue")
    assert "character" in dlg["phase_summary"]


@pytest.mark.slow
def test_cli_xl_backbone(tmp_path):
    """--sd_version xl drives the SDXL-shaped stack end-to-end."""
    dataset = {"d0": {"turn 1": {
        "caption": "a knight", "background": "a forest", "negative": "",
        "objects": [["a knight", [100, 100, 200, 300], 0]]}}}
    ds = tmp_path / "ds"; ds.mkdir()
    (ds / "story.json").write_text(json.dumps(dataset))
    cli.main(["--tiny", "--sd_version", "xl", "--dataset_path", str(ds),
              "--num_steps", "2", "--base_save_dir", str(tmp_path / "o"),
              "--database_path_base", str(tmp_path / "db")])
    assert (tmp_path / "o" / "story" / "run0" / "d0" / "turn 1"
            / "img_0.png").exists()


@pytest.mark.slow
def test_cli_editing_task(tmp_path):
    """--task editing: reads editing.json, writes the editing/ tree, uses
    the single-object prompt template (reference pipelines.py:216-221),
    and survives an objects-free removal turn."""
    dataset = {
        "d0": {
            "turn 1": {"caption": "a vase", "background": "a kitchen",
                       "negative": "",
                       "objects": [["a blue vase", [150, 150, 150, 200], 0]]},
            "turn 2": {"caption": "the vase is gone", "background":
                       "a kitchen", "negative": "a blue vase",
                       "objects": []},
        }
    }
    ds_dir = tmp_path / "ds"
    ds_dir.mkdir()
    (ds_dir / "editing.json").write_text(json.dumps(dataset))
    save = tmp_path / "out"
    cli.main(["--tiny", "--task", "editing", "--dataset_path", str(ds_dir),
              "--num_steps", "2", "--base_save_dir", str(save),
              "--database_path_base", str(tmp_path / "db")])
    assert (save / "editing" / "run0" / "d0" / "turn 1" / "img_0.png").exists()
    assert (save / "editing" / "run0" / "d0" / "turn 2" / "img_0.png").exists()


def test_theater_task_prompt_templates():
    """story → 'full-body picture of {phrase}'; editing → 'single object,
    {phrase}' (reference models/pipelines.py:216-221)."""
    from theatergen_tpu.theater import Theater

    for task, prefix in [("story", "full-body picture of"),
                         ("editing", "single object,")]:
        so = Theater.so_prompt_for(task, "a blue vase")
        assert so == f"{prefix} a blue vase"
