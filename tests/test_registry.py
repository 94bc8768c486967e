import pytest

from multimodal_tta_tpu.registry import (
    Registry,
    MODELS,
    register_model,
    get_model,
    list_all_components,
)


def test_register_and_get():
    reg = Registry("test")

    @reg.register("foo")
    class Foo:
        pass

    assert reg.get("foo") is Foo
    assert reg.has("foo")
    assert "foo" in reg
    assert reg.list_all() == ["foo"]


def test_direct_registration():
    reg = Registry("test")

    class Bar:
        pass

    reg.register("bar", Bar)
    assert reg.get("bar") is Bar


def test_missing_raises():
    reg = Registry("test")
    with pytest.raises(KeyError):
        reg.get("nope")


def test_duplicate_warns():
    reg = Registry("test")
    reg.register("x", int)
    with pytest.warns(UserWarning):
        reg.register("x", float)
    assert reg.get("x") is float


def test_global_registries_exist():
    comps = list_all_components()
    for key in (
        "models",
        "datasets",
        "dataset_builders",
        "evaluation_strategies",
        "criteria",
        "providers",
        "plugins",
        "tta_methods",
    ):
        assert key in comps


def test_decorator_roundtrip_on_global():
    @register_model("__unit_test_model__")
    class M:
        pass

    assert get_model("__unit_test_model__") is M
    del MODELS._registry["__unit_test_model__"]


def test_auto_import_resolves_cold_registry():
    """get_<kind>() must work in a process that never imported the
    registering package — registration is an import side effect, and
    bench.py shipped broken once because a refactor silently removed the
    only import that performed it. Each auto-imported kind is resolved
    through the registry helper ALONE in a fresh interpreter."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from multimodal_tta_tpu.registry import (\n"
        "    get_model, get_dataset_builder, get_evaluation_strategy, get_tta_method)\n"
        "assert get_tta_method('tent').__name__ == 'TentAdapter'\n"
        "assert get_model('unet').__name__ == 'UNet3D'\n"
        "assert get_dataset_builder('hecktor21') is not None\n"
        "assert get_evaluation_strategy('seg_eval') is not None\n"
        "print('ok')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip().endswith("ok")


def test_auto_import_hint_consumed_once():
    """A wrong name after auto-import still raises the catalogue KeyError
    (the hint must not retry the import forever)."""
    reg = Registry("test", auto_import="multimodal_tta_tpu.tta")
    with pytest.raises(KeyError, match="not registered"):
        reg.get("nope")
    with pytest.raises(KeyError, match="not registered"):
        reg.get("nope")
