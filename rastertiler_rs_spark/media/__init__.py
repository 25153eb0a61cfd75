"""Container-level media codecs built from the public specs (no external
libs): ISO BMFF / MP4 mux+demux+probe and MPEG-1 Layer III frame-header
walk. Frame/sample DECODE of the compressed payloads stays environment-
blocked in operators/multimodal.py — these modules make the container
plumbing (metadata, sample extraction) real.
"""

from .mp3 import encode_mp3, probe_mp3  # noqa: F401
from .mp4 import demux_mp4, encode_mp4, probe_mp4  # noqa: F401
