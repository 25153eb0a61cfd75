from .codec import (  # noqa: F401
    Colormap,
    decode_png,
    decode_band,
    decode_rgba,
    encode_grayscale8,
    encode_grayscale16,
    encode_interlaced,
    encode_paletted,
    encode_rgb,
    encode_rgba,
    rgb_from_u32,
    select_bit_depth,
)
from .apng import apng_frames, encode_apng, probe_apng  # noqa: F401
