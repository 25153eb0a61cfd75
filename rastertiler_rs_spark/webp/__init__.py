from .codec import decode_webp, encode_webp_lossless, probe_webp  # noqa: F401
