from .huffman import HuffmanCodec, build_huffman_codes
from .bitmap import BitmapCodec
