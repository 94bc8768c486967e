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
