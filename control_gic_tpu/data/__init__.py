from .dataset import ImageFolderDataset, EvalImageDataset, prefetch_batches
