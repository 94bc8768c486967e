"""Utility-layer tests: logger, meters, seeding, TTA engine config paths."""

import logging

import numpy as np
import pytest

import multimodal_tta_tpu.evaluation  # noqa: F401 (registers seg_eval)
from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.utils import AverageMeter, LoggerWriter, get_logger, set_random_seed, setup_logger


class TestAverageMeter:
    def test_running_mean(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == pytest.approx(2.0)
        assert m.count == 2
        m.update(5.0, n=2)
        assert m.avg == pytest.approx((1 + 3 + 5 * 2) / 4)

    def test_reset(self):
        m = AverageMeter()
        m.update(10)
        m.reset()
        assert m.avg == 0.0 and m.count == 0


class TestSeeding:
    def test_returns_prng_key_and_seeds_numpy(self):
        key = set_random_seed(123, "practical")
        a = np.random.rand(3)
        set_random_seed(123, "practical")
        b = np.random.rand(3)
        assert np.allclose(a, b)
        assert key.shape == (2,) or key.dtype.name.startswith("key")

    @pytest.mark.parametrize("mode", ["off", "practical", "strict"])
    def test_modes_accepted(self, mode):
        set_random_seed(0, mode)

    def test_bad_mode_raises(self):
        with pytest.raises(ValueError):
            set_random_seed(0, "bogus")


class TestLogger:
    def test_file_and_console(self, tmp_path):
        log_file = str(tmp_path / "x.log")
        logger = setup_logger(log_file=log_file, name="t1")
        logger.info("hello-world-123")
        for h in logger.handlers:
            h.flush()
        assert "hello-world-123" in open(log_file).read()

    def test_no_duplicate_handlers_on_resetup(self):
        l1 = setup_logger(name="t2")
        n1 = len(l1.handlers)
        l2 = setup_logger(name="t2")
        assert len(l2.handlers) == n1

    def test_logger_writer(self, tmp_path):
        log_file = str(tmp_path / "w.log")
        logger = setup_logger(log_file=log_file, name="t3", to_console=False)
        w = LoggerWriter(logger, logging.INFO)
        w.write("line one\nline two\n")
        w.flush()
        content = open(log_file).read()
        assert "line one" in content and "line two" in content


class TestTTAEngineConfigPaths:
    def test_engine_selects_norm_method(self):
        from multimodal_tta_tpu.tta import NormAdapter, TTAEngine

        cfg = ConfigNode(
            {
                "task": {"seed": 0, "eval_strategy": "seg_eval"},
                "training": {"criterion": {"sigmoid": True}},
                "evaluation": {"seg": {"region_order": ["gtvt"]}},
                "tta": {"method": "norm", "episodic": True},
            }
        )
        engine = TTAEngine(cfg, mesh=None)
        assert isinstance(engine.adapter, NormAdapter)
        assert engine.episodic

    def test_engine_unknown_method_raises(self):
        from multimodal_tta_tpu.tta import TTAEngine

        cfg = ConfigNode(
            {
                "task": {"seed": 0, "eval_strategy": "seg_eval"},
                "training": {"criterion": {"sigmoid": True}},
                "evaluation": {"seg": {"region_order": ["gtvt"]}},
                "tta": {"method": "nonexistent"},
            }
        )
        with pytest.raises(KeyError):
            TTAEngine(cfg, mesh=None)


def test_retain_host_memory_idempotent():
    """The glibc allocator policy applies on linux, is idempotent, and
    normal large-array allocation keeps working under it."""
    import numpy as np

    from multimodal_tta_tpu.utils.host_alloc import retain_host_memory

    first = retain_host_memory()
    assert retain_host_memory() == first  # cached, no re-mallopt
    import sys

    if sys.platform.startswith("linux"):
        assert first is True
    a = np.zeros(2_000_000, np.float32)  # > mmap threshold before the policy
    a[::1024] = 1.0
    assert float(a.sum()) > 0
