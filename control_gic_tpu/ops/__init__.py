from .resample import nearest_resize, upsample_nearest, avg_pool
from .entropy import patch_entropy
from .router import triple_grain_router, RouterOutput, grain_indices_from_masks
from .quantize import vq_lookup, vq_quantize, codebook_gather, VQResult
