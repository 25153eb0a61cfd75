"""Container-level media codecs built from the public specs (no external
libs): ISO BMFF / MP4 mux+demux+probe, AVI (RIFF) mux+demux+probe, and
the MPEG-1 Layer III frame-header walk. Frame/sample DECODE of the
compressed payloads stays environment-blocked in operators/multimodal.py
except Motion-JPEG (real via jpeg/codec.py) — these modules make the
container plumbing (metadata, sample extraction) real.
"""

from .avi import demux_avi, encode_avi, probe_avi  # noqa: F401
from .mp3 import encode_mp3, probe_mp3  # noqa: F401
from .mp4 import demux_mp4, encode_mp4, probe_mp4  # noqa: F401
