import os

import pytest

from multimodal_tta_tpu.conf import ConfigNode, compose, from_yaml_str
from multimodal_tta_tpu.utils.config import get_config, require_config

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO_ROOT, "configs")


class TestConfigNode:
    def test_attribute_access(self):
        cfg = ConfigNode({"a": {"b": 1}, "c": [1, 2]})
        assert cfg.a.b == 1
        assert cfg["a"]["b"] == 1
        assert cfg.c == [1, 2]

    def test_select_default(self):
        cfg = ConfigNode({"a": {"b": 1}})
        assert cfg.select("a.b") == 1
        assert cfg.select("a.x", 5) == 5
        assert cfg.select("z.q.r") is None

    def test_set_path(self):
        cfg = ConfigNode()
        cfg.set_path("x.y.z", 3)
        assert cfg.x.y.z == 3

    def test_merge_deep(self):
        a = ConfigNode({"m": {"x": 1, "y": 2}})
        a.merge({"m": {"y": 3, "z": 4}})
        assert a.m.x == 1 and a.m.y == 3 and a.m.z == 4

    def test_interpolation(self):
        cfg = from_yaml_str("a: hello\nb: ${a}_world\nc:\n  d: ${b}\n")
        cfg.resolve()
        assert cfg.b == "hello_world"
        assert cfg.c.d == "hello_world"

    def test_interp_non_string(self):
        cfg = from_yaml_str("n: 5\nm: ${n}\n")
        cfg.resolve()
        assert cfg.m == 5

    def test_now_interp(self):
        cfg = from_yaml_str("d: ${now:%Y}\n")
        cfg.resolve()
        assert len(str(cfg.d)) == 4


class TestAccessors:
    def test_require_present(self):
        cfg = ConfigNode({"training": {"epochs": 10}})
        assert require_config(cfg, "training.epochs") == 10

    def test_require_missing_raises(self):
        with pytest.raises(KeyError):
            require_config(ConfigNode({}), "nope.x")

    def test_get_default(self):
        cfg = ConfigNode({"a": 1})
        assert get_config(cfg, "a") == 1
        assert get_config(cfg, "b", 7) == 7
        assert get_config(cfg, "a", type_=float) == 1.0


class TestCompose:
    def test_compose_default_tree(self):
        cfg = compose(CONFIG_DIR, "config", ["hydra.job.chdir=false"])
        # global patch applied model shape for hecktor21
        assert cfg.model.in_channels == 2
        assert cfg.model.num_classes == 1
        assert cfg.model.norm == "INSTANCE"
        assert cfg.model.name == "unet"
        assert cfg.task.name == "hecktor21"
        assert cfg.task.seed == 42
        assert cfg.dataset.target_center == "CHUS"
        assert cfg.training.criterion.lambda_dice == 5.0
        assert cfg.training.criterion.ce_weight == [50.0]
        assert cfg.evaluation.seg.threshold == 0.3
        assert cfg.tta.method == "none"

    def test_group_override(self):
        cfg = compose(CONFIG_DIR, "config", ["task=brats", "dataset=brats", "hydra.job.chdir=false"])
        assert cfg.task.name == "brats"
        assert cfg.model.in_channels == 4
        assert cfg.model.num_classes == 3
        assert cfg.evaluation.seg.region_order == ["ET", "TC", "WT"]
        assert cfg.training.criterion.include_background is True

    def test_value_overrides(self):
        cfg = compose(
            CONFIG_DIR,
            "config",
            [
                "training.epochs=3",
                "training.batch_size=2",
                "dataset.target_center=CHUM",
                "training.optimizers.adam.lr=5e-3",
                "training.gpu_ids=[1]",
                "hydra.job.chdir=false",
            ],
        )
        assert cfg.training.epochs == 3
        assert cfg.dataset.target_center == "CHUM"
        assert cfg.training.optimizers.adam.lr == pytest.approx(5e-3)
        assert cfg.training.gpu_ids == [1]

    def test_add_override(self):
        cfg = compose(CONFIG_DIR, "config", ["+extra.flag=true", "hydra.job.chdir=false"])
        assert cfg.extra.flag is True

    def test_tta_group(self):
        cfg = compose(CONFIG_DIR, "config", ["tta=tent", "tta.steps=4", "hydra.job.chdir=false"])
        assert cfg.tta.method == "tent"
        assert cfg.tta.steps == 4
        assert cfg.tta.update == "norm"

    def test_run_dir_interpolation(self):
        cfg = compose(CONFIG_DIR, "config", ["task.run_name=myrun"])
        rd = cfg.hydra.run.dir
        assert "outputs/hecktor21" in rd and "myrun" in rd


class TestComposerEdgeCases:
    def test_list_index_override(self):
        cfg = compose(
            CONFIG_DIR, "config",
            ["dataset=brats", "task=brats", "dataset.sources.0.csv_path=/x/y.csv", "hydra.job.chdir=false"],
        )
        assert cfg.dataset.sources[0]["csv_path"] == "/x/y.csv"
        # other entries untouched
        assert cfg.dataset.sources[1]["name"] == "brats24_ssa"

    def test_delete_override(self):
        cfg = compose(CONFIG_DIR, "config", ["~method", "hydra.job.chdir=false"])
        assert "method" not in cfg

    def test_sci_float_without_dot(self):
        cfg = compose(CONFIG_DIR, "config", ["training.optimizers.adam.lr=5e-3", "hydra.job.chdir=false"])
        assert isinstance(cfg.training.optimizers.adam.lr, float)

    def test_bool_and_list_values(self):
        cfg = compose(
            CONFIG_DIR, "config",
            ["training.eval_on_train=true", "training.gpu_ids=[0,1,2]", "hydra.job.chdir=false"],
        )
        assert cfg.training.eval_on_train is True
        assert cfg.training.gpu_ids == [0, 1, 2]

    def test_missing_group_file_raises(self):
        with pytest.raises(FileNotFoundError):
            compose(CONFIG_DIR, "config", ["task=does_not_exist"])

    def test_tta_consistency_block(self):
        cfg = compose(CONFIG_DIR, "config", ["tta=tent", "hydra.job.chdir=false"])
        assert cfg.tta.consistency.weight == 1.0

    def test_defense_presets_compose(self):
        cfg = compose(CONFIG_DIR, "config", ["tta=cotta_restore", "hydra.job.chdir=false"])
        assert cfg.tta.restore.enabled is True
        assert cfg.tta.restore.prob == 0.01
        assert cfg.tta.episodic is False
        cfg = compose(CONFIG_DIR, "config", ["tta=eata_gate", "hydra.job.chdir=false"])
        assert cfg.tta.reliability.enabled is True
        assert cfg.tta.reliability.margin_ratio == 0.4

    def test_cotta_preset_composes(self):
        cfg = compose(CONFIG_DIR, "config", ["tta=cotta", "hydra.job.chdir=false"])
        assert cfg.tta.method == "cotta"
        assert cfg.tta.ema == 0.999
        assert cfg.tta.n_views == 2
        assert cfg.tta.serve == "teacher"
        assert cfg.tta.restore.enabled is True
        assert cfg.tta.episodic is False
