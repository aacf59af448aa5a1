from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.loader import (
    ArrayLoader,
    NumpyDataset,
    prepare_dataset,
)
from tensornetworkforml_tpu.data.mnist import get_MNIST_dataset, max_pool_2x2

__all__ = [
    "create_dataset",
    "ArrayLoader",
    "NumpyDataset",
    "prepare_dataset",
    "get_MNIST_dataset",
    "max_pool_2x2",
]
