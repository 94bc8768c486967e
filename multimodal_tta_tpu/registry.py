"""Component registry.

Name -> class registries with decorator-based registration. The public API
mirrors the reference framework (reference: src/registry.py:10-167) so that
user code written against the reference's registry keeps working:

    from multimodal_tta_tpu.registry import register_model, get_model

    @register_model("unet")
    class UNet3D(...): ...

    cls = get_model("unet")

Seven global registries are exposed (MODELS, DATASETS, DATASET_BUILDERS,
EVALUATION_STRATEGIES, CRITERIA, PROVIDERS, PLUGINS). The reference never
populates CRITERIA/PROVIDERS/PLUGINS (vestigial hooks of a parent project);
we keep them for API parity and use CRITERIA for registered loss builders.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Type


class Registry:
    """A simple name -> class mapping with decorator registration."""

    def __init__(self, name: str):
        self.name = name
        self._registry: Dict[str, Type] = {}

    def register(self, name: str, cls: Optional[Type] = None) -> Callable:
        """Register a component.

        Usable as a decorator ``@registry.register("x")`` or called directly
        ``registry.register("x", Cls)``.
        """

        def _register(c: Type) -> Type:
            if name in self._registry and self._registry[name] is not c:
                import warnings

                warnings.warn(f"'{name}' is already registered in {self.name}; overwriting")
            self._registry[name] = c
            return c

        if cls is not None:
            return _register(cls)
        return _register

    def get(self, name: str) -> Type:
        if name not in self._registry:
            raise KeyError(
                f"'{name}' is not registered in {self.name}. "
                f"Available: {sorted(self._registry.keys())}"
            )
        return self._registry[name]

    def has(self, name: str) -> bool:
        return name in self._registry

    def list_all(self) -> List[str]:
        return list(self._registry.keys())

    def clear(self) -> None:
        self._registry.clear()

    def __contains__(self, name: str) -> bool:
        return name in self._registry

    def __len__(self) -> int:
        return len(self._registry)


# Global registries (same set as the reference).
MODELS = Registry("models")
DATASETS = Registry("datasets")
DATASET_BUILDERS = Registry("dataset_builders")
EVALUATION_STRATEGIES = Registry("evaluation_strategies")
CRITERIA = Registry("criteria")
PROVIDERS = Registry("providers")
PLUGINS = Registry("plugins")
# New in the TPU framework: test-time-adaptation methods.
TTA_METHODS = Registry("tta_methods")


def register_model(name: str):
    return MODELS.register(name)


def register_dataset(name: str):
    return DATASETS.register(name)


def register_dataset_builder(name: str):
    return DATASET_BUILDERS.register(name)


def register_evaluation_strategy(name: str):
    return EVALUATION_STRATEGIES.register(name)


def register_criterion(name: str):
    return CRITERIA.register(name)


def register_provider(name: str):
    return PROVIDERS.register(name)


def register_plugin(name: str):
    return PLUGINS.register(name)


def register_tta_method(name: str):
    return TTA_METHODS.register(name)


def get_model(name: str) -> Type:
    return MODELS.get(name)


def get_dataset(name: str) -> Type:
    return DATASETS.get(name)


def get_dataset_builder(name: str) -> Type:
    return DATASET_BUILDERS.get(name)


def get_evaluation_strategy(name: str) -> Type:
    return EVALUATION_STRATEGIES.get(name)


def get_criterion(name: str) -> Type:
    return CRITERIA.get(name)


def get_provider(name: str) -> Type:
    return PROVIDERS.get(name)


def get_plugin(name: str) -> Type:
    return PLUGINS.get(name)


def get_tta_method(name: str) -> Type:
    return TTA_METHODS.get(name)


def list_models() -> List[str]:
    return MODELS.list_all()


def list_datasets() -> List[str]:
    return DATASETS.list_all()


def list_dataset_builders() -> List[str]:
    return DATASET_BUILDERS.list_all()


def list_evaluation_strategies() -> List[str]:
    return EVALUATION_STRATEGIES.list_all()


def list_criteria() -> List[str]:
    return CRITERIA.list_all()


def list_providers() -> List[str]:
    return PROVIDERS.list_all()


def list_plugins() -> List[str]:
    return PLUGINS.list_all()


def list_tta_methods() -> List[str]:
    return TTA_METHODS.list_all()


def list_all_components() -> Dict[str, List[str]]:
    return {
        "models": MODELS.list_all(),
        "datasets": DATASETS.list_all(),
        "dataset_builders": DATASET_BUILDERS.list_all(),
        "evaluation_strategies": EVALUATION_STRATEGIES.list_all(),
        "criteria": CRITERIA.list_all(),
        "providers": PROVIDERS.list_all(),
        "plugins": PLUGINS.list_all(),
        "tta_methods": TTA_METHODS.list_all(),
    }
