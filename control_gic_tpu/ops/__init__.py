from .resample import (nearest_resize, upsample_nearest, avg_pool,
                       upsample2_conv3x3, subpixel_enabled)
from .entropy import patch_entropy
from .router import (triple_grain_router, RouterOutput,
                     grain_indices_from_masks, mode_from_ratios)
from .quantize import vq_lookup, vq_quantize, codebook_gather, VQResult
from .attention import attention, attention_flash, attention_xla
from .fused_norm import spatial_norm, spatial_norm_reference
from .norm_conv import spatial_norm_conv, norm_conv_reference
