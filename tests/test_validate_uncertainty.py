"""Unit tests for scripts/validate_uncertainty.py pure helpers.

The harness itself needs a trained model + the real chip; the rank statistic
and the mask scoring it reports are pure functions testable here (scipy is
the oracle for Spearman, hand-counted overlap for Dice).
"""

import importlib.util
import os

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_harness():
    path = os.path.join(REPO_ROOT, "scripts", "validate_uncertainty.py")
    spec = importlib.util.spec_from_file_location("validate_uncertainty", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def harness():
    return _load_harness()


def test_spearman_matches_scipy_oracle(harness):
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.RandomState(3)
    for trial in range(5):
        x = rng.randn(23)
        y = 0.5 * x + rng.randn(23)
        if trial >= 3:  # exercise the tie-averaging branch
            x = np.round(x)
            y = np.round(y)
        expected = scipy_stats.spearmanr(x, y).correlation
        assert harness.spearman(x, y) == pytest.approx(expected, abs=1e-12)


def test_spearman_perfect_and_inverse(harness):
    x = np.arange(10.0)
    assert harness.spearman(x, x) == pytest.approx(1.0)
    assert harness.spearman(x, -x) == pytest.approx(-1.0)


def test_case_dice_counts_overlap(harness, tmp_path):
    from multimodal_tta_tpu.data import nifti

    gt = np.zeros((8, 8, 4), dtype=np.float32)
    gt[2:6, 2:6, 1:3] = 1.0  # 32 voxels
    pred = np.zeros_like(gt)
    pred[4:6, 2:6, 1:3] = 1.0  # 16 voxels, all inside GT

    gt_path = str(tmp_path / "caseX_gtvt.nii.gz")
    nifti.save(gt, np.eye(4), gt_path, dtype=np.float32)
    nifti.save(pred, np.eye(4), str(tmp_path / "caseX_pred.nii.gz"), dtype=np.uint8)

    d = harness.case_dice({"caseX": gt_path}, str(tmp_path), "caseX")
    assert d == pytest.approx(2 * 16 / (32 + 16))


def test_case_dice_both_empty_is_perfect(harness, tmp_path):
    from multimodal_tta_tpu.data import nifti

    empty = np.zeros((4, 4, 2), dtype=np.float32)
    gt_path = str(tmp_path / "caseE_gtvt.nii.gz")
    nifti.save(empty, np.eye(4), gt_path, dtype=np.float32)
    nifti.save(empty, np.eye(4), str(tmp_path / "caseE_pred.nii.gz"), dtype=np.uint8)
    assert harness.case_dice({"caseE": gt_path}, str(tmp_path), "caseE") == 1.0
