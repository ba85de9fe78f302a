"""Datasets (reference: datasets/normal_datasets/__init__.py:4-7)."""

from vf_nerf_tpu.datasets.replica import ReplicaDataset
from vf_nerf_tpu.datasets.scannet import ScanNetDataset
from vf_nerf_tpu.datasets.synthetic import (SyntheticBoxDataset,
                                            SyntheticOfficeDataset)

dataset_dict = {
    "replica": ReplicaDataset,
    "scannet": ScanNetDataset,
    "synthetic": SyntheticBoxDataset,
    "synthetic_office": SyntheticOfficeDataset,
}
