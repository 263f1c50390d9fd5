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


def test_dump_disabled(tmp_path):
    r = DumpRegistry(None) if True else None
    r.directory = None
    r.dump("x", np.zeros(3))  # no-op, no error
    assert not r.enabled


def test_progress_bar():
    buf = io.StringIO()
    progress_bar(0.5, out=buf)
    assert "50%" in buf.getvalue()
    progress_bar(1.0, out=buf)
    assert buf.getvalue().endswith("\n")
