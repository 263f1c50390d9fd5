import io

import numpy as np

from tortoise_tpu.utils import DumpRegistry, StageTimer, compare_dumps
from tortoise_tpu.utils.progress import progress_bar


def test_stage_timer():
    t = StageTimer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    assert set(t.times) == {"a", "b"}
    assert "a=" in t.summary() and "total" in t.summary()


def test_dump_and_compare(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    r1, r2 = DumpRegistry(d1), DumpRegistry(d2)
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    r1.dump("layer0", x)
    r1.dump("layer1", x * 2)
    r2.dump("layer0", x)
    r2.dump("layer1", x * 2 + 0.5)
    bad = compare_dumps(d1, d2, atol=0.01)
    assert bad == [("layer1", 0.5)]


def test_dump_disabled(tmp_path, monkeypatch):
    monkeypatch.delenv("TORTOISE_DUMP_DIR", raising=False)
    r = DumpRegistry(None)
    r.dump("x", np.zeros(3))  # no-op, no error
    assert not r.enabled
    # enabling the env var AFTER construction takes effect (the default
    # registry is built at import time)
    monkeypatch.setenv("TORTOISE_DUMP_DIR", str(tmp_path / "late"))
    assert r.enabled
    r.dump("x", np.zeros(3))
    assert (tmp_path / "late" / "0000_x.npy").exists()


def test_progress_bar():
    buf = io.StringIO()
    progress_bar(0.5, out=buf)
    assert "50%" in buf.getvalue()
    progress_bar(1.0, out=buf)
    assert buf.getvalue().endswith("\n")


def test_compare_dumps_flags_nan(tmp_path):
    """A NaN-poisoned tensor must be reported as a mismatch (NaN > atol
    is False, so a naive compare passed the exact failure this tool
    exists to catch); bare names without a counter prefix must not
    crash the indexer."""
    import numpy as np

    from tortoise_tpu.utils.debug import compare_dumps

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    np.save(a / "0000_x.npy", np.array([1.0, np.nan], np.float32))
    np.save(b / "0000_x.npy", np.array([1.0, 2.0], np.float32))
    np.save(a / "melspec.npy", np.ones(3, np.float32))   # no prefix
    np.save(b / "melspec.npy", np.ones(3, np.float32))
    bad = compare_dumps(str(a), str(b))
    assert [n for n, _ in bad] == ["x"]
    import math

    assert math.isnan(bad[0][1])
