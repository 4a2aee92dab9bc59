"""Utils: LossHistory (parity with utils.py:43-99), recursive dict merge
(utils.py:28-40), StepTimer, plotting smoke tests."""
import numpy as np
import pytest

from snnimageclassification_tpu.utils.dict_utils import mapping_update_recursively
from snnimageclassification_tpu.utils.history import LossHistory
from snnimageclassification_tpu.utils.profiling import StepTimer


class TestMappingUpdateRecursively:
    def test_flat(self):
        d = {"a": 1, "b": 2}
        assert mapping_update_recursively(d, {"b": 3, "c": 4}) == {
            "a": 1, "b": 3, "c": 4,
        }

    def test_nested_merge(self):
        # the checkpoint-meta use case: epochs dict grows, best replaced
        d = {"best": "p0", "epochs": {"0": "p0"}}
        mapping_update_recursively(d, {"epochs": {"1": "p1"}})
        mapping_update_recursively(d, {"best": "p1", "epochs": {"2": "p2"}})
        assert d == {"best": "p1", "epochs": {"0": "p0", "1": "p1", "2": "p2"}}

    def test_non_mapping_replaces(self):
        d = {"a": {"x": 1}}
        mapping_update_recursively(d, {"a": 5})
        assert d == {"a": 5}


class TestLossHistory:
    def test_concat_scalars_and_lists(self):
        h = LossHistory()
        h.concat({"train": 1.0, "val": 2.0})
        h.concat({"train": [0.5, 0.25], "val": [1.5, 1.0]})
        assert h["train"] == [1.0, 0.5, 0.25]
        assert h["val"] == [2.0, 1.5, 1.0]

    def test_min_and_min_item(self):
        h = LossHistory({"train": [3.0, 1.0, 2.0], "val": [5.0, 4.0, 6.0]})
        assert h.min("train") == 1.0
        assert h.min("missing") == np.inf
        assert h.min_item("val") == {"train": 1.0, "val": 4.0}

    def test_container_protocol(self):
        h = LossHistory({"a": [1.0]})
        assert "a" in h and "b" not in h
        assert len(h) == 1
        assert list(iter(h)) == ["a"]
        h.append("a", 2.0)
        assert h["a"] == [1.0, 2.0]

    def test_plot(self, tmp_path):
        pytest.importorskip("matplotlib")
        h = LossHistory({"train": [1.0, 0.5], "val": [2.0, 1.5]})
        p = tmp_path / "loss.png"
        h.plot(save_path=str(p))
        assert p.stat().st_size > 0


class TestStepTimer:
    def test_warmup_and_summary(self):
        t = StepTimer(warmup=1)
        for _ in range(4):
            with t.step():
                pass
        s = t.summary(batch_size=100)
        assert s["steps"] == 3
        assert s["img_per_s"] > 0

    def test_stop_without_start_raises(self):
        with pytest.raises(RuntimeError):
            StepTimer().stop()
