"""tools/aot.py: the AOT executable cache bench.py stages jit through.

CPU-backend round-trip: a miss compiles and serializes; a hit deserializes
and returns a runnable executable with identical results; changing the
program (shape or code) changes the key and misses instead of returning a
stale executable.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools import aot


@pytest.fixture()
def aot_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "aot")
    monkeypatch.setattr(aot, "AOT_DIR", d)
    return d


def _files(d):
    return sorted(f for f in os.listdir(d) if f.endswith(".bin")) if os.path.isdir(d) else []


def test_miss_save_hit_roundtrip(aot_dir):
    def f(x, y):
        return jnp.tanh(x @ y).sum()

    x = jnp.ones((16, 16), jnp.float32)
    c1 = aot.jit_cached("t", f, (x, x))
    want = float(c1(x, x))
    files = _files(aot_dir)
    assert len(files) == 1 and files[0].startswith("t-")

    # second call: must load the serialized executable (poison compile to
    # prove the compile path is not taken)
    import jax.stages

    class _Boom:
        def __get__(self, *a):
            raise AssertionError("compile() called on a cache hit")

    c2 = aot.jit_cached("t", f, (x, x))
    got = float(c2(x, x))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert _files(aot_dir) == files  # no new entry


def test_program_change_rekeys(aot_dir):
    def f(x):
        return (x * 2.0).sum()

    def g(x):
        return (x * 3.0).sum()

    x = jnp.ones((8,), jnp.float32)
    aot.jit_cached("t", f, (x,))
    aot.jit_cached("t", g, (x,))  # different program, same name
    assert len(_files(aot_dir)) == 2
    # different shape also re-keys
    aot.jit_cached("t", f, (jnp.ones((4,), jnp.float32),))
    assert len(_files(aot_dir)) == 3


def test_committed_entries_are_structurally_sound():
    """Every committed tools/aot/*.bin must gunzip + unpickle into the
    (payload, in_tree, out_tree, dev_ids) tuple jit_cached wrote.

    The cache is committed so the driver's bench run skips the 10-20 min
    remote cold compiles (BENCH_r02/r03 lost every stage to them); a
    corrupt or stale-format entry would silently degrade the driver run
    back to a cold compile, so structural validity is pinned here. Full
    deserialize_and_load needs the real TPU runtime and is exercised by
    bench.py itself.
    """
    committed = _files(aot.AOT_DIR)
    if not committed:
        pytest.skip("no committed AOT entries on this checkout")
    for name in committed:
        entry = aot._read(os.path.join(aot.AOT_DIR, name))
        assert isinstance(entry, tuple) and len(entry) == 4, name
        payload, in_tree, out_tree, dev_ids = entry
        assert isinstance(payload, bytes) and len(payload) > 0, name
        assert isinstance(dev_ids, list) and dev_ids, name
        assert all(isinstance(i, int) for i in dev_ids), name
        # the trees must be reusable pytree defs (init programs take no
        # arguments, so in_tree may have zero leaves — but it must still
        # be a real ((), {}) call signature node)
        assert in_tree.num_nodes >= 1, name
        assert out_tree.num_leaves >= 1, name


def test_lower_only_mode_checks_without_compiling(aot_dir, monkeypatch):
    """AOT_LOWER_ONLY (tools/check_aot_drift.py's hook): the named program
    is lowered and key-checked, then LowerOnlyDone is raised BEFORE any
    deserialize or backend compile — and the verdict matches the cache."""

    def f(x):
        return (x * 2.0).sum()

    x = jnp.ones((8,), jnp.float32)

    monkeypatch.setenv("AOT_LOWER_ONLY", "t")
    with pytest.raises(aot.LowerOnlyDone) as ei:
        aot.jit_cached("t", f, (x,))
    assert not ei.value.hit  # nothing cached yet
    assert _files(aot_dir) == []  # and nothing was compiled/saved

    # names not in the list behave normally
    monkeypatch.setenv("AOT_LOWER_ONLY", "other")
    c = aot.jit_cached("t", f, (x,))
    assert float(c(x)) == 16.0
    assert len(_files(aot_dir)) == 1

    # now the same program checks as a HIT, still without loading
    monkeypatch.setenv("AOT_LOWER_ONLY", "other,t")
    with pytest.raises(aot.LowerOnlyDone) as ei:
        aot.jit_cached("t", f, (x,))
    assert ei.value.hit
    assert _files(aot_dir)[0] == f"t-{ei.value.key}.bin"


def test_corrupt_entry_falls_back_to_compile(aot_dir):
    def f(x):
        return (x + 1.0).sum()

    x = jnp.ones((8,), jnp.float32)
    aot.jit_cached("t", f, (x,))
    path = os.path.join(aot_dir, _files(aot_dir)[0])
    with open(path, "wb") as fh:
        fh.write(b"garbage")
    c = aot.jit_cached("t", f, (x,))  # load fails -> recompile transparently
    assert float(c(x)) == 16.0
