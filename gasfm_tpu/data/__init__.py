"""Data layer: scene containers, loaders, synthetic generation, sampling,
augmentation, outlier injection, batched prefetch loading.

Parity surface: reference code/datasets/ + the data parts of
code/utils/dataset_utils.py."""

from gasfm_tpu.data.augmentation import apply_rotational_homography_aug
from gasfm_tpu.data.dataset import SceneLoader, ScenesDataSet, dataloader_collate_fn
from gasfm_tpu.data.loaders import (
    correct_matches_global,
    create_scene_data,
    create_scene_data_from_list,
)
from gasfm_tpu.data.outliers import OutlierInjector, inject_outliers
from gasfm_tpu.data.sampling import get_subset, sample_data, sample_indices
from gasfm_tpu.data.scene import SceneData
from gasfm_tpu.data.synthetic import generate_synthetic_scene, synthetic_scene_from_conf

__all__ = [
    "OutlierInjector",
    "SceneData",
    "SceneLoader",
    "ScenesDataSet",
    "apply_rotational_homography_aug",
    "correct_matches_global",
    "create_scene_data",
    "create_scene_data_from_list",
    "dataloader_collate_fn",
    "generate_synthetic_scene",
    "get_subset",
    "inject_outliers",
    "sample_data",
    "sample_indices",
    "synthetic_scene_from_conf",
]
