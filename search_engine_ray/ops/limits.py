"""Decode-bomb guards for the pure-stdlib media codecs.

A corrupt or adversarial payload can declare enormous dimensions in a
few header bytes (65535x65535 GIF screen = 17 GB of RGBA; a 1 MB PNG
zlib stream can inflate 1000x).  The media stages quarantine payloads
per row by catching exceptions (`ops/multimodal.py` MediaDecoder), but
an allocation that large is an OOM-kill, not an exception — at 100 TB
one crafted file would take down a worker and its in-flight blocks.
Every codec therefore validates header-declared sizes against this cap
BEFORE allocating, raising ValueError so the bomb lands in the
quarantine like any other bad payload.
"""

MAX_DECODE_PIXELS = 1 << 26  # 67M px: ~268 MB as RGBA — generous for
# any legitimate crawl image/frame, far below a worker's heap


def check_pixels(n: int, what: str) -> None:
    """Raise ValueError when a header declares more than
    MAX_DECODE_PIXELS pixels for one decode (`what` names the codec
    surface for the quarantine's err column)."""
    if n > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{what} declares {n} pixels "
            f"(> {MAX_DECODE_PIXELS} decode cap)")
