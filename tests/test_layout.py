"""LLM layout stage: parsing, filtering, generation, eval."""

import pytest

from theatergen_tpu.utils import layout as L
from theatergen_tpu.utils.cache import QueryCache


RESPONSE = """Objects: [('a red knight', [50, 100, 150, 300], 0), ('a green dragon', [300, 80, 180, 330], 1)]
Background prompt: a forest clearing
Negative prompt: blurry, low quality
"""


def test_parse_layout_response():
    ids, boxes, bg, neg = L.parse_layout_response(RESPONSE)
    assert ids == [0, 1]
    assert boxes[0] == ("a red knight", (50, 100, 150, 300))
    assert bg == "a forest clearing"
    assert neg == "blurry, low quality"


def test_parse_layout_no_negative_and_none():
    ids, boxes, bg, neg = L.parse_layout_response(
        "Objects: [('a cat', [10, 10, 50, 50], 0)]\nBackground prompt: a room\n")
    assert neg == ""
    _, _, _, neg2 = L.parse_layout_response(
        "Objects: [('a cat', [10, 10, 50, 50], 0)]\n"
        "Background prompt: a room\nNegative prompt: None\n")
    assert neg2 == ""


def test_parse_layout_no_objects():
    ids, boxes, bg, neg = L.parse_layout_response(
        "Objects: No objects\nBackground prompt: an empty beach\n")
    assert boxes == [] and bg == "an empty beach"


def test_filter_boxes_drops_and_scales():
    # empty and background boxes dropped
    out = L.filter_boxes([
        ("a", (0, 0, 0, 10)),            # zero width
        ("bg", (0, 0, 512, 512)),        # background-size
        ("b", (10, 10, 100, 100)),
    ])
    assert [n for n, _ in out] == ["b"]
    # out-of-bounds triggers rescale to fit
    out = L.filter_boxes([("big", (-100, 0, 800, 400))])
    (name, (x, y, w, h)), = out
    assert x >= 0 and y >= 0 and x + w <= 512 and y + h <= 512
    assert name == "big"


def test_filter_boxes_dict_format():
    # scale_boxes=False keeps in-bounds boxes untouched
    out = L.filter_boxes([
        {"name": "a cat.", "bounding_box": (10, 10, 60, 60)},
        {"name": "none", "bounding_box": None},
    ], scale_boxes=False)
    assert out == [("a cat", (10, 10, 60, 60))]
    # in-bounds layouts stay untouched by default; force_scale replicates
    # the reference's always-rescale behavior (utils/parse.py:196-223)
    out2 = L.filter_boxes([{"name": "a cat", "bounding_box": (10, 10, 60, 60)}])
    assert out2 == [("a cat", (10, 10, 60, 60))]
    out3 = L.filter_boxes([{"name": "a cat", "bounding_box": (10, 10, 60, 60)}],
                          force_scale=True)
    (_, (x, y, w, h)), = out3
    assert (w, h) == (180, 180)  # 3x max_scale
    # out-of-bounds still triggers the rescale automatically
    out4 = L.filter_boxes([("big", (-100, 0, 800, 400))])
    (_, (x, y, w, h)), = out4
    assert x >= 0 and x + w <= 512


def test_generate_layout_with_cache(tmp_path):
    calls = []

    def fake_llm(prompt):
        calls.append(prompt)
        assert "Caption: two cats" in prompt
        return RESPONSE

    cache = QueryCache(str(tmp_path / "c.json"))
    spec = L.generate_layout("two cats", fake_llm, cache)
    spec2 = L.generate_layout("two cats", fake_llm, cache)
    assert len(calls) == 1          # second call served from cache
    assert spec == spec2
    assert spec["bg_prompt"] == "a forest clearing"
    assert len(spec["gen_boxes"]) == 2


def test_eval_layout_rules():
    boxes = [("a red knight", (50, 100, 150, 300)),
             ("a green dragon", (300, 80, 180, 330))]
    out = L.eval_layout(
        "a knight to the left of a dragon", boxes)
    assert out["num_boxes"] == 2
    assert out["mention_coverage"] == 1.0
    assert out["in_bounds_rate"] == 1.0
    assert out["spatial_ok"] is True
    out2 = L.eval_layout("a dragon to the left of a knight",
                         boxes[::-1])
    assert out2["spatial_ok"] is False
