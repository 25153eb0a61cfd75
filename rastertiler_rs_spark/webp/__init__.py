from .codec import (  # noqa: F401
    decode_webp,
    encode_webp_anim,
    encode_webp_extended,
    encode_webp_lossless,
    encode_webp_lossy,
    encode_webp_lossy_gray,
    probe_webp,
    webp_anim_frames,
)
