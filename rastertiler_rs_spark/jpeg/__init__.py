from .codec import decode_jpeg, encode_jpeg_gray, encode_jpeg_rgb, jpeg_dims

__all__ = ["decode_jpeg", "encode_jpeg_gray", "encode_jpeg_rgb", "jpeg_dims"]
