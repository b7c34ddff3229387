from .config import return_dataset
from .native_eval import NativeEvalDataset
from . import native_loader
from .prefetch import PrefetchIterator, prefetch
from .dataset import (
    RubiksDataset,
    VideoRecord,
    batch_iterator,
    parse_list_file,
    sample_all_indices,
    sample_dense_indices,
    sample_test_indices,
    sample_train_indices,
    sample_val_indices,
)
from .transforms import (
    Compose,
    GroupCenterCrop,
    GroupFullResSample,
    GroupMultiScaleCrop,
    GroupNormalize,
    GroupOverSample,
    GroupRandomCrop,
    GroupRandomHorizontalFlip,
    GroupRandomSizedCrop,
    GroupScale,
    IdentityTransform,
    Stack,
    ToClipArray,
)

__all__ = [
    "return_dataset", "NativeEvalDataset", "native_loader", "RubiksDataset", "VideoRecord", "batch_iterator", "PrefetchIterator", "prefetch",
    "parse_list_file", "sample_all_indices", "sample_dense_indices",
    "sample_test_indices", "sample_train_indices", "sample_val_indices", "Compose", "GroupCenterCrop", "GroupFullResSample",
    "GroupMultiScaleCrop", "GroupNormalize", "GroupOverSample",
    "GroupRandomCrop", "GroupRandomHorizontalFlip", "GroupRandomSizedCrop",
    "GroupScale", "IdentityTransform", "Stack", "ToClipArray",
]
