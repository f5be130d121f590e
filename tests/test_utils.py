"""Host utilities: tokenizer, vis, query cache, profiling."""

import json
import os

import numpy as np
import pytest

from theatergen_tpu.utils import cache as C
from theatergen_tpu.utils import profiling as P
from theatergen_tpu.utils import vis as V
from theatergen_tpu.utils.tokenizer import (
    CLIPBPETokenizer, HashTokenizer, find_phrase_token_indices,
)


def test_hash_tokenizer_deterministic_and_bounded():
    tok = HashTokenizer(vocab_size=1024)
    ids1 = tok.encode("a red knight rides")
    ids2 = tok.encode("a red knight rides")
    assert ids1 == ids2
    assert all(0 <= i < 1024 for i in ids1)
    batch = tok(["a cat", "a dog and a bird"], max_length=8)
    assert batch.shape == (2, 8)
    assert batch[0, 0] == tok.bos_token_id
    assert batch[0, -1] == tok.eos_token_id


def test_hash_tokenizer_truncation():
    tok = HashTokenizer(vocab_size=1024, max_length=8)
    out = tok(" ".join(["word"] * 100))
    assert out.shape == (1, 8)


def test_phrase_token_indices():
    tok = HashTokenizer(vocab_size=1024)
    prompt = "a forest clearing with a green dragon"
    idx = find_phrase_token_indices(tok, prompt, "dragon")
    # 'dragon' is the 7th word → position 7 (BOS at 0)
    assert idx == [7]
    idx2 = find_phrase_token_indices(tok, prompt, "green dragon")
    assert idx2 == [6, 7]
    assert find_phrase_token_indices(tok, prompt, "unicorn") == []


def test_bpe_tokenizer_from_merges(tmp_path):
    merges = tmp_path / "merges.txt"
    merges.write_text("#version: 0.2\nl o\nlo w</w>\ne r</w>\n")
    tok = CLIPBPETokenizer(str(merges))
    ids = tok.encode("low er")
    assert len(ids) >= 2
    assert tok.encode("low er") == tok.encode("low er")
    # 'low' should merge into a single token ("lo"+"w</w>" merged)
    words = tok.encode_words("low")
    assert len(words[0][1]) == 1


def test_vis_display_and_index(tmp_path):
    V.reset_save_ind()
    img = np.random.rand(8, 8, 3)
    p1 = V.display(img, img_dir=str(tmp_path))
    p2 = V.display(img, img_dir=str(tmp_path))
    assert p1.endswith("img_0.png") and p2.endswith("img_1.png")
    assert os.path.exists(p1) and os.path.exists(p2)
    V.reset_save_ind()
    assert V.display(img, img_dir=str(tmp_path)).endswith("img_0.png")


def test_vis_helpers():
    lat = np.random.randn(1, 8, 8, 4)
    v = V.visualize_latents(lat)
    assert v.shape == (8, 8, 3) and v.min() >= 0 and v.max() <= 1
    m = V.visualize_masks([np.eye(8), 1 - np.eye(8)])
    assert m.shape == (8, 8, 3)
    a = V.visualize_attn(np.random.rand(4, 64), out_hw=16)
    assert a.shape == (16, 16, 3)
    boxed = V.draw_boxes(np.zeros((32, 32, 3)), [[0.25, 0.25, 0.75, 0.75]])
    assert boxed[8, 8].tolist() == [1.0, 0, 0]


def test_query_cache_roundtrip(tmp_path):
    path = str(tmp_path / "cache.json")
    c = C.QueryCache(path)
    calls = []

    def compute():
        calls.append(1)
        return {"boxes": [[1, 2, 3, 4]]}

    v1 = c.get_or_compute("prompt A", compute)
    v2 = c.get_or_compute("prompt A", compute)
    assert v1 == v2 and len(calls) == 1
    # persistence across instances
    c2 = C.QueryCache(path)
    assert c2.get("prompt A") == v1
    assert c2.counters["prompt A"] >= 1


def test_phase_timer():
    t = P.PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    json.loads(t.report())


def test_materialize_params_dtypes_and_determinism():
    """materialize_params ships host-cast buffers grouped by target dtype
    (the on-device fp32->bf16 cast OOMed SDXL's 2.6B params on a 16 GB
    chip); values must stay seeded-deterministic and the bf16 override
    must equal the fp32 stream rounded, with integer leaves zeroed."""
    import jax
    import jax.numpy as jnp

    from theatergen_tpu.utils.fastinit import materialize_params

    def init():
        k = jax.random.key(0)
        return {
            "w": jax.random.normal(k, (4, 6), jnp.float32),
            "emb": jax.random.normal(k, (3, 2), jnp.bfloat16),
            "step": jnp.zeros((), jnp.int32),
        }

    p1 = materialize_params(init, seed=11)
    p2 = materialize_params(init, seed=11)
    p3 = materialize_params(init, seed=12)
    assert p1["w"].dtype == jnp.float32 and p1["emb"].dtype == jnp.bfloat16
    assert p1["step"].dtype == jnp.int32 and int(p1["step"]) == 0
    assert np.array_equal(np.asarray(p1["w"]), np.asarray(p2["w"]))
    assert not np.array_equal(np.asarray(p1["w"]), np.asarray(p3["w"]))

    # dtype override: every float leaf becomes bf16, bit-identical to the
    # single-group fp32 stream rounded on host
    pb = materialize_params(init, seed=11, dtype=jnp.bfloat16)
    pf = materialize_params(init, seed=11, dtype=jnp.float32)
    assert {l.dtype for l in jax.tree_util.tree_leaves(pb)} <= {
        jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int32)}
    assert np.array_equal(
        np.asarray(pb["w"]), np.asarray(pf["w"].astype(jnp.bfloat16)))
    assert np.array_equal(
        np.asarray(pb["emb"]), np.asarray(pf["emb"].astype(jnp.bfloat16)))
