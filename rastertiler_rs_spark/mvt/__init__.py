from .codec import decode_mvt, encode_mvt  # noqa: F401
