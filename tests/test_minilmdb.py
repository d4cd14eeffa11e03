"""minilmdb round-trip + the actual dataset read loops over it (VERDICT
round-1 #9: the LMDB decode path was previously gated-out and untested)."""

import io
import os

import numpy as np
import pytest

from lfm_tpu.data import minilmdb


def test_roundtrip_small_values(tmp_path):
    items = {str(i).encode(): bytes([i]) * (10 + i) for i in range(50)}
    db = str(tmp_path / "small")
    minilmdb.write_db(db, items)

    env = minilmdb.open(db)
    with env.begin() as txn:
        assert txn.stat()["entries"] == 50
        for k, v in items.items():
            assert txn.get(k) == v
        assert txn.get(b"missing") is None
        keys = list(txn.cursor().iternext(keys=True, values=False))
    # iteration is in sorted key order and complete
    assert keys == sorted(items)
    env.close()


def test_roundtrip_overflow_values(tmp_path):
    """Values past the in-page max go to P_OVERFLOW runs (raw 256x256x3
    images in the NVAE format are ~196 KB — always overflow)."""
    rng = np.random.default_rng(0)
    items = {f"img{i}".encode(): rng.integers(0, 256, 196608, np.uint8).tobytes()
             for i in range(4)}
    items[b"tiny"] = b"x"
    db = str(tmp_path / "ovf")
    minilmdb.write_db(db, items)

    env = minilmdb.open(db)
    with env.begin(write=False, buffers=True) as txn:
        assert txn.stat()["entries"] == 5
        assert txn.stat()["overflow_pages"] > 0
        for k, v in items.items():
            assert bytes(txn.get(k)) == v
    env.close()


def test_roundtrip_many_entries_multi_leaf(tmp_path):
    """Enough entries to force multiple leaf pages + a branch root."""
    items = {f"key-{i:06d}".encode(): (f"value-{i}" * 7).encode()
             for i in range(2000)}
    db = str(tmp_path / "multi")
    minilmdb.write_db(db, items)

    env = minilmdb.open(db)
    with env.begin() as txn:
        st = txn.stat()
        assert st["entries"] == 2000
        assert st["depth"] == 2 and st["branch_pages"] == 1
        for i in (0, 1, 999, 1998, 1999):
            k = f"key-{i:06d}".encode()
            assert txn.get(k) == items[k]
        n = sum(1 for _ in txn.cursor().iternext(keys=True, values=False))
        assert n == 2000
    env.close()


def test_empty_db(tmp_path):
    db = str(tmp_path / "empty")
    minilmdb.write_db(db, {})
    env = minilmdb.open(db)
    with env.begin() as txn:
        assert txn.stat()["entries"] == 0
        assert txn.get(b"anything") is None
        assert list(txn.cursor().iternext()) == []


# ---------------------------------------------------------------------------
# the real dataset read loops over minilmdb fixtures
# ---------------------------------------------------------------------------


def _raw_rgb(i, size=32):
    rng = np.random.default_rng(i)
    return rng.integers(0, 256, (size, size, 3), np.uint8)


def test_nvae_lmdb_dataset_read_loop(tmp_path):
    """LMDBDataset: NVAE raw-RGB values keyed str(index)
    (reference datasets_prep/lmdb_datasets.py:38-55)."""
    from lfm_tpu.data.lmdb_datasets import LMDBDataset

    imgs = {str(i).encode(): _raw_rgb(i).tobytes() for i in range(6)}
    root = tmp_path / "celeba"
    minilmdb.write_db(str(root / "train.lmdb"), imgs)

    ds = LMDBDataset(str(root), train=True, image_size=32, random_flip=False)
    assert len(ds) == 6
    x, y = ds[3]
    assert x.shape == (32, 32, 3) and y == 0
    want = _raw_rgb(3).astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(x, want, atol=1e-6)


def test_lsun_dataset_read_loop(tmp_path, monkeypatch):
    """LSUN multi-class: encoded values under arbitrary byte keys with the
    torchvision key cache (reference lsun.py:26-67)."""
    from PIL import Image

    from lfm_tpu.data.lmdb_datasets import LSUN

    monkeypatch.chdir(tmp_path)  # the key cache file lands in CWD

    def encoded(i):
        buf = io.BytesIO()
        Image.fromarray(_raw_rgb(i, 48)).save(buf, format="PNG")
        return buf.getvalue()

    for cls in ("bedroom_train", "church_outdoor_train"):
        items = {f"{cls}-{i}".encode(): encoded(i) for i in range(3)}
        minilmdb.write_db(str(tmp_path / f"{cls}_lmdb"), items)

    ds = LSUN(str(tmp_path), ["bedroom_train", "church_outdoor_train"],
              image_size=32, random_flip=False)
    assert len(ds) == 6
    x0, y0 = ds[0]
    x5, y5 = ds[5]
    assert x0.shape == (32, 32, 3) and y0 == 0
    assert x5.shape == (32, 32, 3) and y5 == 1
    # the key cache is exercised on a second open
    ds2 = LSUN(str(tmp_path), ["bedroom_train", "church_outdoor_train"],
               image_size=32, random_flip=False)
    np.testing.assert_array_equal(ds2[0][0], x0)


def test_image_lmdb_dataset_read_loop(tmp_path):
    """ImageLMDB (celeba_512/1024 format): values keyed '{name}_{i}' with a
    __len__ entry (reference datasets_prep/__init__.py:78-102)."""
    from PIL import Image

    from lfm_tpu.data.lmdb_datasets import ImageLMDB

    def encoded(i):
        buf = io.BytesIO()
        Image.fromarray(_raw_rgb(i, 64)).save(buf, format="PNG")
        return buf.getvalue()

    items = {f"celeba_{i}".encode(): encoded(i) for i in range(4)}
    items[b"__len__"] = b"4"
    minilmdb.write_db(str(tmp_path / "celeba512"), items)

    ds = ImageLMDB(str(tmp_path / "celeba512"), "celeba", image_size=64,
                   random_flip=False)
    assert len(ds) == 4
    x, y = ds[2]
    assert x.shape == (64, 64, 3) and y == 0


# ---------------------------------------------------------------------------
# Cross-validation against a database minilmdb did NOT write: the committed
# fixture is hand-assembled byte-by-byte from the liblmdb header layout
# (tools/make_lmdb_fixture.py), with scrambled physical node order, a stale
# second meta page, branch-before-overflow page numbering, and an odd-sized
# node — none of which minilmdb.write_db produces.
# ---------------------------------------------------------------------------

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "lmdb_handmade")


def _fixture_items():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_lmdb_fixture",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "make_lmdb_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.ITEMS, mod.build()


def test_reader_parses_handmade_fixture():
    items, blob = _fixture_items()
    # the committed binary must BE the spec build (regenerate via
    # tools/make_lmdb_fixture.py if this ever drifts)
    with open(os.path.join(FIXTURE, "data.mdb"), "rb") as f:
        assert f.read() == blob

    env = minilmdb.open(FIXTURE)
    with env.begin() as txn:
        for k, v in items:
            assert txn.get(k) == v, k
        assert txn.get(b"missing") is None
        assert txn.get(b"") is None
        st = txn.stat()
        assert st["entries"] == 5 and st["depth"] == 2
        assert st["branch_pages"] == 1 and st["leaf_pages"] == 2
        assert st["overflow_pages"] == 2
        # newest meta wins: the stale meta (txnid 1) says 3 entries/root 2
        got = list(txn.cursor().iternext(keys=True, values=True))
        assert got == [(k, v) for k, v in items]
        keys_only = list(txn.cursor().iternext(keys=True, values=False))
        assert keys_only == [k for k, _ in items]
    env.close()


def test_lsun_style_key_iteration_over_fixture():
    """The LSUN path (reference lsun.py:26-67) opens the env and caches all
    keys via cursor().iternext(keys=True, values=False) — drive the same
    call pattern data/lmdb_datasets.py:97 uses."""
    env = minilmdb.open(os.path.join(FIXTURE, "data.mdb"))
    with env.begin(write=False) as txn:
        keys = [k for k in txn.cursor().iternext(keys=True, values=False)]
        assert keys == [b"0", b"1", b"2", b"3x", b"zz-big"]
        # per-key fetch like LSUNClass.__getitem__
        val = txn.get(keys[-1])
        assert len(val) == 6000 and val[:4] == bytes((3, 10, 17, 24))
    env.close()
