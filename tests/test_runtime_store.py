"""Native C++ embedding store + CharacterDB integration."""

import numpy as np
import pytest

from theatergen_tpu.runtime import store as rt


pytestmark = pytest.mark.skipif(
    not rt.available(), reason="no native toolchain"
)


def test_store_roundtrip(tmp_path):
    s = rt.EmbeddingStore(str(tmp_path / "e.bin"), dim=8)
    v0 = np.arange(8, dtype=np.float32)
    v1 = np.ones(8, np.float32) * 3
    s.put(0, v0)
    s.put(42, v1)
    assert len(s) == 2
    np.testing.assert_array_equal(s.get(0), v0)
    np.testing.assert_array_equal(s.get(42), v1)
    assert s.get(7) is None
    assert 42 in s and 7 not in s
    assert s.keys() == [0, 42]


def test_store_overwrite_and_delete(tmp_path):
    s = rt.EmbeddingStore(str(tmp_path / "e.bin"), dim=4)
    s.put(1, np.zeros(4, np.float32))
    s.put(1, np.ones(4, np.float32))
    assert len(s) == 1
    np.testing.assert_array_equal(s.get(1), np.ones(4))
    assert s.delete(1)
    assert s.get(1) is None and len(s) == 0


def test_store_persistence(tmp_path):
    path = str(tmp_path / "e.bin")
    s = rt.EmbeddingStore(path, dim=4)
    s.put(5, np.full(4, 2.5, np.float32))
    s.close()
    s2 = rt.EmbeddingStore(path, dim=4)
    np.testing.assert_array_equal(s2.get(5), np.full(4, 2.5))
    # dim mismatch rejected
    with pytest.raises(IOError):
        rt.EmbeddingStore(path, dim=8)


def test_character_db_uses_native_store(tmp_path):
    from theatergen_tpu.db import CharacterDB

    db = CharacterDB(str(tmp_path))
    img = np.random.rand(16, 16, 3).astype(np.float32)
    emb = np.random.rand(32).astype(np.float32)
    db.save(3, img, emb)
    assert (tmp_path / "embeddings.bin").exists()
    assert not (tmp_path / "3.npy").exists()   # native store, no sidecar
    got = db.load_embedding(3)
    np.testing.assert_allclose(got, emb, rtol=1e-6)
    # persists across a fresh DB instance (resume path)
    db2 = CharacterDB(str(tmp_path))
    np.testing.assert_allclose(db2.load_embedding(3), emb, rtol=1e-6)
    img2, emb2, hit = db2.lookup(3)
    assert hit and img2.shape == (16, 16, 3)
    db2.delete(3)
    assert db2.load_embedding(3) is None


def test_character_db_string_ids(tmp_path):
    from theatergen_tpu.db import CharacterDB

    db = CharacterDB(str(tmp_path))
    emb = np.random.rand(8).astype(np.float32)
    db.save("hero", np.zeros((4, 4, 3)), emb)
    np.testing.assert_allclose(db.load_embedding("hero"), emb)


def test_delete_persists_across_reopen(tmp_path):
    """Deletes must survive close/reopen (tombstoned records)."""
    path = str(tmp_path / "e.bin")
    s = rt.EmbeddingStore(path, dim=4)
    s.put(1, np.ones(4, np.float32))
    s.put(2, np.full(4, 2.0, np.float32))
    s.delete(1)
    s.close()
    s2 = rt.EmbeddingStore(path, dim=4)
    assert s2.get(1) is None
    np.testing.assert_array_equal(s2.get(2), np.full(4, 2.0))
    assert s2.keys() == [2]


def test_closed_store_raises(tmp_path):
    s = rt.EmbeddingStore(str(tmp_path / "e.bin"), dim=4)
    s.close()
    with pytest.raises(ValueError):
        len(s)
    with pytest.raises(ValueError):
        s.get(1)
    with pytest.raises(ValueError):
        s.put(1, np.zeros(4, np.float32))
