"""Container-level media codecs built from the public specs (no external
libs): ISO BMFF / MP4 mux+demux+probe, AVI (RIFF) mux+demux+probe,
WebM (EBML/Matroska) mux+demux+probe, Ogg (RFC 3533) mux+demux with
the FLAC-to-Ogg mapping over the complete from-spec FLAC codec
(flac.py, RFC 9639), and MPEG-1 Layer III framing
PLUS payload decode for the verified family (side info, scalefactors,
count1 Huffman, requantization, hybrid filterbank to subband samples —
mp3.py). Remaining payload decode (big-values Huffman table data,
count1 table A, bit reservoir, the Table B.3 synthesis window) stays
environment-blocked with fail-fast errors; video payloads are real for
Motion-JPEG (jpeg/codec.py) and VP8 keyframes (webp/vp8.py).
"""

from .avi import demux_avi, encode_avi, probe_avi  # noqa: F401
from .flac import decode_flac, encode_flac, probe_flac  # noqa: F401
from .ogg import (decode_ogg_flac, demux_ogg, encode_ogg,  # noqa: F401
                  encode_ogg_flac, probe_ogg_flac)
from .mp3 import (decode_mp3_spectra, encode_mp3, encode_mp3_l3,  # noqa: F401
                  l3_subband_samples, probe_mp3)
from .mp4 import demux_mp4, encode_mp4, probe_mp4  # noqa: F401
from .webm import demux_webm, encode_webm, probe_webm  # noqa: F401
