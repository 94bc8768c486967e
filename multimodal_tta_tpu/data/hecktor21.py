"""HECKTOR21 PET/CT dataset with dynamic leave-one-center-out splits.

Split semantics are bit-exact with the reference (reference:
src/datasets/hecktor21.py:66-89, 159-232): given target_center T, test = all
rows with center T; the remaining rows are split train/val by drawing
``val_per_center`` row indices per center with one shared
``np.random.RandomState(split_seed)`` iterating centers in sorted order — the
exact same RNG consumption order, so splits (and thus Dice) match the CPU
reference for identical manifests.

Sample layout (TPU-native channels-last):
  image: float32 [D, H, W, 2]  (D=Z, H=Y, W=X; channels CT, PET)
  label: float32 [D, H, W, 1]  (binary GTVt)
  domain = center_code
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..conf.node import ConfigNode
from ..registry import register_dataset_builder
from ..utils.config import get_config, require_config
from ..utils.logger import get_logger
from .base_builder import BaseDatasetBuilder
from .nifti import DecodedCache, load_canonical_dhw
from .transforms import get_seg_transforms


def _resolve_path(path: Any, root_dir: Optional[str]) -> str:
    if path is None or (isinstance(path, float) and np.isnan(path)):
        return ""
    p = str(path)
    if root_dir and not os.path.isabs(p):
        return os.path.join(root_dir, p)
    return p


def _validate_shape(arr: np.ndarray, expected: Optional[Tuple[int, ...]], what: str, case_id: str) -> None:
    if expected is None:
        return
    if tuple(arr.shape) != tuple(expected):
        raise ValueError(
            f"[HECKTOR21] Shape mismatch for {what} case={case_id}: got {tuple(arr.shape)}, "
            f"expected {tuple(expected)}. This dataset assumes OFFLINE preprocessing "
            f"already unified shape."
        )


def to_binary_mask(y: np.ndarray) -> np.ndarray:
    """Coerce {0,1} / {0,255} / nonzero masks to uint8 {0,1}
    (reference: src/datasets/hecktor21.py:51-63)."""
    if y.dtype.kind not in ("i", "u"):
        y = np.rint(y)
    y = y.astype(np.int16, copy=False)
    uniq = np.unique(y)
    if uniq.size == 0:
        return y.astype(np.uint8, copy=False)
    if np.all(np.isin(uniq, [0, 1])):
        return y.astype(np.uint8, copy=False)
    if np.all(np.isin(uniq, [0, 255])):
        return (y // 255).astype(np.uint8, copy=False)
    return (y != 0).astype(np.uint8, copy=False)


def sample_val_indices_per_center(
    df_non_target: pd.DataFrame,
    center_code_col: str,
    val_per_center: int,
    seed: int,
) -> np.ndarray:
    """Bit-exact port of the reference's val sampling (hecktor21.py:66-89)."""
    if val_per_center <= 0 or len(df_non_target) == 0:
        return np.array([], dtype=np.int64)

    rng = np.random.RandomState(seed)
    val_indices: List[int] = []
    centers = sorted(df_non_target[center_code_col].astype(str).str.upper().unique().tolist())
    for c in centers:
        d = df_non_target[df_non_target[center_code_col].astype(str).str.upper() == c]
        idxs = d.index.to_numpy()
        if idxs.size == 0:
            continue
        k = min(val_per_center, int(idxs.size))
        chosen = rng.choice(idxs, size=k, replace=False)
        val_indices.extend(chosen.tolist())
    return np.array(val_indices, dtype=np.int64)


class Hecktor21Dataset:
    def __init__(
        self,
        manifest_csv: str,
        split: str,
        *,
        target_center: str,
        val_per_center: int = 5,
        split_seed: int = 2026,
        expected_shape: Optional[Tuple[int, int, int]] = None,  # (X,Y,Z)
        drop_unlabeled: bool = True,
        strict_label_values: bool = True,
        root_dir: Optional[str] = None,
        patient_col: str = "patient_id",
        status_col: str = "status",
        ok_status_values: Sequence[str] = ("ok",),
        ct_col: str = "ct_proc",
        pt_col: str = "pt_proc",
        label_col: str = "gtvt_proc",
        center_code_col: str = "center_code",
        center_id_col: str = "center_id",
        transform: Optional[Callable] = None,
        cache_in_memory: bool = False,
        logger=None,
    ):
        self.logger = logger or get_logger()
        self.split = str(split).lower().strip()
        if self.split not in ("train", "val", "test"):
            raise ValueError(f"[HECKTOR21] split must be in {{train,val,test}}, got '{split}'")

        self.expected_shape = tuple(expected_shape) if expected_shape is not None else None
        self.drop_unlabeled = bool(drop_unlabeled)
        self.strict_label_values = bool(strict_label_values)
        self.root_dir = root_dir
        self.transform = transform
        self._cache = DecodedCache() if cache_in_memory else None
        self._epoch = 0

        self.patient_col = patient_col
        self.status_col = status_col
        self.ok_status_values = [str(x).lower() for x in list(ok_status_values)]
        self.ct_col = ct_col
        self.pt_col = pt_col
        self.label_col = label_col
        self.center_code_col = center_code_col
        self.center_id_col = center_id_col

        if not os.path.exists(manifest_csv):
            raise FileNotFoundError(f"[HECKTOR21] manifest_csv not found: {manifest_csv}")
        df = pd.read_csv(manifest_csv)

        for c in [patient_col, ct_col, pt_col, center_code_col]:
            if c not in df.columns:
                raise ValueError(f"[HECKTOR21] manifest missing required column '{c}'")
        if label_col not in df.columns:
            df[label_col] = np.nan
        if status_col not in df.columns:
            df[status_col] = "ok"

        # 1) status filter (reference: hecktor21.py:173-174)
        ok_set = set(self.ok_status_values)
        df = df[df[status_col].astype(str).str.lower().isin(ok_set)].copy()

        # 2) drop unlabeled
        if self.drop_unlabeled:
            df = df[df[label_col].notna() & (df[label_col].astype(str) != "")].copy()

        df[center_code_col] = df[center_code_col].astype(str).str.upper()

        target_center = str(target_center).upper().strip()
        if target_center == "":
            raise ValueError("[HECKTOR21] target_center cannot be empty")

        df_target = df[df[center_code_col] == target_center].copy()
        df_non_target = df[df[center_code_col] != target_center].copy()

        if len(df_target) == 0:
            raise ValueError(
                f"[HECKTOR21] target_center='{target_center}' has 0 samples after filtering."
            )
        if len(df_non_target) == 0:
            raise ValueError("[HECKTOR21] non-target set is empty; cannot build train/val.")

        # 3) val sampling per non-target center
        val_indices = sample_val_indices_per_center(
            df_non_target, center_code_col, int(val_per_center), int(split_seed)
        )
        if val_indices.size > 0:
            df_val = df_non_target.loc[val_indices].copy()
            df_train = df_non_target.drop(index=val_indices).copy()
        else:
            df_val = df_non_target.iloc[0:0].copy()
            df_train = df_non_target.copy()

        d_use = {"test": df_target, "val": df_val, "train": df_train}[self.split]
        if len(d_use) == 0:
            raise ValueError(
                f"[HECKTOR21] split='{self.split}' is empty "
                f"(target_center={target_center}, val_per_center={val_per_center})."
            )

        self._rows: List[Dict[str, Any]] = [row.to_dict() for _, row in d_use.iterrows()]
        self.logger.info(
            f"[HECKTOR21] split='{self.split}' n={len(self._rows)} | "
            f"target_center={target_center} | "
            f"non_target_centers={df_non_target[center_code_col].nunique()} | "
            f"val_per_center={val_per_center} seed={split_seed}"
        )

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return len(self._rows)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        info = self._rows[idx]
        case_id = str(info.get(self.patient_col))
        center_code = str(info.get(self.center_code_col, "")).upper()
        center_id = info.get(self.center_id_col, None)
        try:
            center_id = int(center_id) if (center_id is not None and str(center_id) != "nan") else -1
        except Exception:
            center_id = -1

        ct_path = _resolve_path(info.get(self.ct_col, ""), self.root_dir)
        pt_path = _resolve_path(info.get(self.pt_col, ""), self.root_dir)
        lb_path = _resolve_path(info.get(self.label_col, ""), self.root_dir)

        if not os.path.exists(ct_path):
            raise FileNotFoundError(f"[HECKTOR21] Missing CT file: {ct_path} (case={case_id})")
        if not os.path.exists(pt_path):
            raise FileNotFoundError(f"[HECKTOR21] Missing PET file: {pt_path} (case={case_id})")
        if self.drop_unlabeled and ((not lb_path) or (not os.path.exists(lb_path))):
            raise FileNotFoundError(f"[HECKTOR21] Missing label file: {lb_path} (case={case_id})")

        # fused native decode straight to (D,H,W)=(Z,Y,X)
        load = self._cache.get_or_load if self._cache is not None else load_canonical_dhw
        ct = load(ct_path)
        pt = load(pt_path)
        exp_dhw = self.expected_shape[::-1] if self.expected_shape else None
        _validate_shape(ct, exp_dhw, "ct", case_id)
        _validate_shape(pt, exp_dhw, "pt", case_id)

        image = np.stack([ct, pt], axis=-1)  # [D,H,W,2]

        if (not lb_path) or (not os.path.exists(lb_path)):
            y_np = np.zeros(ct.shape, dtype=np.uint8)
        else:
            y = load(lb_path)
            _validate_shape(y, exp_dhw, "label", case_id)
            y_np = to_binary_mask(y)

        label = y_np[..., None].astype(np.float32)  # [D,H,W,1]

        if self.strict_label_values:
            uniq = np.unique(label)
            bad = [v for v in uniq.tolist() if v not in (0.0, 1.0)]
            if bad:
                raise ValueError(
                    f"[HECKTOR21] Label must be binary {{0,1}}. got={uniq.tolist()} (case={case_id})"
                )

        if self.transform is not None:
            rng = np.random.Generator(np.random.Philox(key=[self._epoch, idx]))
            image, label = self.transform(image, label, rng)

        return {
            "image": image,
            "label": label,
            "case_id": case_id,
            "domain": center_code,
            "center_code": center_code,
            "center_id": center_id,
            "index": int(idx),
        }


@register_dataset_builder("hecktor21")
class Hecktor21Builder(BaseDatasetBuilder):
    """Config schema matches reference: src/datasets/hecktor21.py:304-360."""

    def __init__(self, config: ConfigNode):
        super().__init__(config)
        dcfg = require_config(config, "dataset")

        self.manifest_csv = str(require_config(dcfg, "manifest_csv", type_=str))

        exp_shape = get_config(dcfg, "expected_shape", None)
        self.expected_shape = tuple(exp_shape) if exp_shape is not None else None

        self.drop_unlabeled = bool(get_config(dcfg, "drop_unlabeled", True))
        self.strict_label_values = bool(get_config(dcfg, "strict_label_values", True))

        self.patient_col = str(get_config(dcfg, "patient_col", "patient_id"))
        self.status_col = str(get_config(dcfg, "status_col", "status"))
        self.ok_status_values = list(get_config(dcfg, "ok_status_values", ["ok"]))
        self.ct_col = str(get_config(dcfg, "ct_col", "ct_proc"))
        self.pt_col = str(get_config(dcfg, "pt_col", "pt_proc"))
        self.label_col = str(get_config(dcfg, "label_col", "gtvt_proc"))
        self.center_code_col = str(get_config(dcfg, "center_code_col", "center_code"))
        self.center_id_col = str(get_config(dcfg, "center_id_col", "center_id"))
        self.root_dir = get_config(dcfg, "root_dir", None)

        self.cache_in_memory = bool(get_config(dcfg, "cache_in_memory", False))
        self.target_center = str(require_config(dcfg, "target_center", type_=str))
        self.val_per_center = int(get_config(dcfg, "val_per_center", 5))
        self.split_seed = int(get_config(dcfg, "split_seed", 2026))
        self.channel_names = [str(x) for x in get_config(dcfg, "modality_order", ["ct", "pt"])]

    def build_transform(self, split_norm: str):
        tcfg = get_config(self.config, "training.data.transforms", ConfigNode())
        normalize = bool(require_config(tcfg, "normalize"))
        geom_aug = bool(require_config(tcfg, "geom_aug"))
        intensity_aug = bool(require_config(tcfg, "intensity_aug"))
        mean = get_config(tcfg, "mean", [0.0, 0.0])
        std = get_config(tcfg, "std", [1.0, 1.0])
        intensity_policy = get_config(tcfg, "intensity_policy", None)
        on_device = bool(get_config(tcfg, "on_device", False))

        image_size = get_config(tcfg, "image_size", None)
        if image_size is not None:
            if len(list(image_size)) != 3:
                raise ValueError("[hecktor21] training.data.transforms.image_size must be [D,H,W]")
            image_size = [int(x) for x in list(image_size)]

        return get_seg_transforms(
            ndim=3,
            split=split_norm,
            normalize=normalize,
            geom_aug=geom_aug,
            intensity_aug=intensity_aug,
            mean=mean,
            std=std,
            expected_label_channels=1,
            region_label_as_float=True,
            image_size=image_size,  # shape check only, never resizes
            intensity_policy=intensity_policy,
            channel_names=self.channel_names,
            on_device=on_device,
        )

    def build_dataset(self, split: str, **overrides) -> Optional[Hecktor21Dataset]:
        split_norm = self._normalize_split(split)
        transform = overrides.get("transform", None)
        if transform is None:
            transform = self.build_transform(split_norm)

        return Hecktor21Dataset(
            manifest_csv=self.manifest_csv,
            split=split_norm,
            target_center=str(overrides.get("target_center", self.target_center)),
            val_per_center=int(overrides.get("val_per_center", self.val_per_center)),
            split_seed=int(overrides.get("split_seed", self.split_seed)),
            expected_shape=overrides.get("expected_shape", self.expected_shape),
            drop_unlabeled=bool(overrides.get("drop_unlabeled", self.drop_unlabeled)),
            strict_label_values=bool(
                overrides.get("strict_label_values", self.strict_label_values)
            ),
            root_dir=overrides.get("root_dir", self.root_dir),
            patient_col=self.patient_col,
            status_col=self.status_col,
            ok_status_values=self.ok_status_values,
            ct_col=self.ct_col,
            pt_col=self.pt_col,
            label_col=self.label_col,
            center_code_col=self.center_code_col,
            center_id_col=self.center_id_col,
            transform=transform,
            cache_in_memory=bool(overrides.get("cache_in_memory", self.cache_in_memory)),
            logger=self.logger,
        )
