from .blocks import ResnetBlock, AttnBlock, SpatialNorm, Downsample, Upsample
from .encoder import Encoder
from .decoder import Decoder
from .cgic import CGIC, CGICConfig, EncodeOutput
from .discriminator import NLayerDiscriminator
from .lpips import LPIPS
