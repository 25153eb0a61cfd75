from .codec import (  # noqa: F401
    decode_webp,
    encode_webp_lossless,
    encode_webp_lossy,
    encode_webp_lossy_gray,
    probe_webp,
)
