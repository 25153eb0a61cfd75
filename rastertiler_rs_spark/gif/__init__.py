from .codec import decode_gif, encode_gif, gif_frames, gif_probe

__all__ = ["decode_gif", "encode_gif", "gif_frames", "gif_probe"]
