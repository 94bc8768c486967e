from . import nifti  # noqa: F401
from .base_builder import BaseDatasetBuilder  # noqa: F401
from .loader import HostLoader, default_collate  # noqa: F401
from .transforms import SegTransform, get_seg_transforms  # noqa: F401

# Import for registration side effects.
from . import hecktor21  # noqa: F401
from . import brats  # noqa: F401

__all__ = [
    "nifti",
    "BaseDatasetBuilder",
    "HostLoader",
    "default_collate",
    "SegTransform",
    "get_seg_transforms",
]
