"""Synthetic NIfTI dataset fixtures for tests.

The generators live in the package (multimodal_tta_tpu/data/synthetic.py) so
the benchmark harness can reuse them; this module keeps the historical test
import path.
"""

from multimodal_tta_tpu.data.synthetic import (  # noqa: F401
    make_brats_fixture,
    make_hecktor_fixture,
)
