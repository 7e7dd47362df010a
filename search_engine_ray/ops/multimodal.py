"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container.
Formats decodable from the published specs are decoded for REAL — PCM
WAV (``wave``), binary PPM/PGM (header parse), PNG (``zlib`` inflate +
scanline unfilter), baseline JPEG (ops/jpeg.py) and GIF incl. animation
(ops/gif.py) — while codec-dependent formats (MP3/H.264/WebP) raise
``NotImplementedError`` behind the same dispatch.  The Ray-side plumbing
(schema, actor-pool stage shape, batch sizing for large binary payloads,
typed metadata output) is real and tested with both paths.

Scale notes baked into the design:
- binary payloads make rows wide: the stage uses a SMALL batch_size so
  batch x concurrency fits worker heaps (guide: memory-aware batching);
- decode state (codec contexts, models) is actor state, built once.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),       # image | audio | video
    ("payload", pa.binary()),    # opaque encoded bytes
    ("meta", pa.string()),       # JSON typed metadata
])


class MediaDecoder:
    """Actor-pool UDF: binary payload -> typed features.

    ``impl='real'`` raises NotImplementedError (decoder libs absent);
    ``impl='fake'`` produces deterministic features from the bytes so the
    pipeline plumbing is testable end-to-end.
    """

    def __init__(self, impl: str = "fake", feature_dim: int = 8):
        self.impl = impl
        self.dim = feature_dim

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        """Real decode for stdlib-decodable formats (WAV PCM via ``wave``,
        PPM/PGM via header parse, PNG via zlib + unfilter); formats whose
        codecs are absent from this environment (JPEG/MP3/H.264) raise —
        plug PIL.Image.open / soundfile.read here."""
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._wav_features(payload)
        if payload[:2] in (b"P6", b"P5"):
            return self._pnm_features(payload)
        if payload[:8] == _PNG_SIG:
            return self._png_features(payload)
        if payload[:2] == b"\xff\xd8":
            return self._jpeg_features(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return self._gif_features(payload)
        raise NotImplementedError(
            f"no stdlib decoder for this payload (kind={kind!r}); "
            "MP3/H.264 need external libs absent from this environment")

    def _fit(self, vals: list) -> np.ndarray:
        out = np.zeros(self.dim)
        v = np.asarray(vals, dtype=np.float64)[:self.dim]
        out[:len(v)] = v
        return out

    def _wav_features(self, payload: bytes) -> np.ndarray:
        """(duration_s, sample_rate, channels, rms, peak, zero-cross rate)
        from PCM WAV — pure stdlib."""
        x, sr, ch = decode_wav(payload)
        nf = len(x) // ch if ch else 0
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        peak = float(np.max(np.abs(x))) if len(x) else 0.0
        zcr = (float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
               if len(x) > 1 else 0.0)
        return self._fit([nf / sr if sr else 0.0, sr, ch, rms, peak, zcr])

    def _pnm_features(self, payload: bytes) -> np.ndarray:
        """(width, height, channels, mean, std, min, max) from binary
        PPM(P6)/PGM(P5) — manual header parse, no image libs."""
        w, h, maxval, ch, i = _pnm_header(payload)
        if maxval > 255:
            raise NotImplementedError("16-bit PNM")
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                           offset=i).astype(np.float64)
        return self._fit([w, h, ch, float(px.mean()), float(px.std()),
                          float(px.min()), float(px.max())])

    def _png_features(self, payload: bytes) -> np.ndarray:
        """(width, height, channels, mean, std, min, max) from a real
        PNG decode — zlib inflate + scanline unfilter, pure stdlib."""
        px = decode_png(payload).astype(np.float64)
        h, w, ch = px.shape
        return self._fit([w, h, ch, float(px.mean()), float(px.std()),
                          float(px.min()), float(px.max())])

    def _jpeg_features(self, payload: bytes) -> np.ndarray:
        """Same feature layout from a real baseline-JPEG decode
        (ops/jpeg.py, pure numpy from the T.81 spec)."""
        from search_engine_ray.ops.jpeg import decode_jpeg

        return self._frame_features(decode_jpeg(payload))

    def _gif_features(self, payload: bytes) -> np.ndarray:
        """Same feature layout from a real GIF decode of the first
        frame (ops/gif.py, pure stdlib LZW — exact pixels)."""
        from search_engine_ray.ops.gif import decode_gif

        return self._frame_features(decode_gif(payload))

    def _frame_features(self, px: np.ndarray) -> np.ndarray:
        """(width, height, channels, mean, std, min, max) of one decoded
        frame — shared by the JPEG/GIF paths and the video sampler."""
        px = px.astype(np.float64)
        h, w, ch = px.shape
        return self._fit([w, h, ch, float(px.mean()), float(px.std()),
                          float(px.min()), float(px.max())])

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        return rng.random(self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Quarantine contract: a malformed/unsupported payload NEVER
        raises out of the stage (at corpus scale one bad file must not
        kill a 100-TB job) — failed rows get ``ok=False`` + a truncated
        ``err`` string and zero features, and flow to a quarantine sink
        downstream (filter on ``ok``)."""
        decode = self._decode_real if self.impl == "real" else self._decode_fake
        feats, sizes, oks, errs = [], [], [], []
        for payload, kind in zip(batch.column("payload").to_pylist(),
                                 batch.column("kind").to_pylist()):
            try:
                feats.append(decode(payload, kind))
                oks.append(True)
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine, not crash
                feats.append(np.zeros(self.dim))
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}"[:200])
            # a NULL payload must quarantine like any bad row, not
            # TypeError out of the stage on len(None)
            sizes.append(len(payload) if payload is not None else 0)
        flat = pa.array(np.concatenate(feats) if feats else
                        np.zeros(0), pa.float64())
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "features": pa.FixedSizeListArray.from_arrays(flat, self.dim),
            "ok": pa.array(oks, pa.bool_()),
            "err": pa.array(errs, pa.string()),
        })


def decode_media(ds, *, impl: str = "fake", batch_size: int = 64,
                 concurrency: int = 2):
    """The multimodal decode stage: small batches (wide binary rows),
    actor pool, typed feature output."""
    return ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"impl": impl},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


# ------------------------------------------------------------- PNG codec
# Pure-stdlib PNG (zlib inflate + per-scanline unfilter).  Supports the
# non-interlaced 8-bit color types: 0 gray, 2 RGB, 4 gray+alpha, 6 RGBA.
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels).  Real decode: walks
    chunks, inflates concatenated IDAT with ``zlib``, reverses filters
    0-4 (sub via per-lane cumsum, up fully vectorized, average/paeth by
    the spec's sequential recurrence per scanline)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace:
        raise NotImplementedError(
            f"PNG depth={depth} color={ctype} interlace={interlace}")
    ch = _PNG_CHANNELS[ctype]
    from search_engine_ray.ops.limits import check_pixels

    if w == 0 or h == 0:
        # zero dims make expected==0 below, and decompressobj's
        # max_length=0 means UNLIMITED — a zero-dim header would bypass
        # the bounded inflate entirely (decode-bomb guard)
        raise ValueError(f"PNG declares zero dimension ({w}x{h})")
    check_pixels(w * h * ch, "PNG IHDR")  # decode-bomb guard
    stride = w * ch
    expected = h * (stride + 1)  # PNG's exact inflated size is known
    # bounded inflate: zlib.decompress() has no output cap, so a small
    # crafted IDAT could expand to GBs before the reshape check fires
    dobj = zlib.decompressobj()
    inflated = dobj.decompress(b"".join(idat), expected)
    if dobj.unconsumed_tail or len(inflated) != expected:
        raise ValueError(
            f"PNG IDAT inflates to != {expected} bytes (corrupt or bomb)")
    raw = np.frombuffer(inflated, dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    ftypes, lines = raw[:, 0], raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f, cur = int(ftypes[y]), lines[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # sub: per-lane prefix sum mod 256
            rec = np.cumsum(cur.reshape(w, ch), axis=0).reshape(stride)
        elif f == 2:  # up
            rec = cur + prev
        elif f in (3, 4):  # average / paeth: sequential left recurrence
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = int(prev[x])
                # predictors read RECONSTRUCTED (mod-256) bytes, so the
                # left value must be masked as the recurrence advances
                if f == 3:
                    rec[x] = (cur[x] + ((int(a) + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = int(a) + b - c
                    pa_, pb, pc = abs(p - int(a)), abs(p - b), abs(p - c)
                    pred = (a if pa_ <= pb and pa_ <= pc
                            else (b if pb <= pc else c))
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
        out[y] = rec & 0xFF
    return out.astype(np.uint8).reshape(h, w, ch)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w) or (h, w, ch) array -> PNG bytes (stdlib zlib; test
    fixture + example of the payload contract).  ``filter_type`` is
    applied to every scanline to exercise specific decode paths."""
    import struct
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    px = pixels.astype(np.int64)
    stride = w * ch
    flat = px.reshape(h, stride)
    rows = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.zeros(stride, dtype=np.int64)
            left[ch:] = cur[:-ch]
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            left = np.zeros(stride, dtype=np.int64)
            left[ch:] = cur[:-ch]
            enc = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            left = np.zeros(stride, dtype=np.int64)
            left[ch:] = cur[:-ch]
            ul = np.zeros(stride, dtype=np.int64)
            ul[ch:] = prev[:-ch]
            p = left + prev - ul
            pa_, pb, pc = (np.abs(p - left), np.abs(p - prev),
                           np.abs(p - ul))
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = cur - pred
        else:
            raise ValueError(f"filter {filter_type}")
        rows.append(bytes([filter_type])
                    + (enc & 0xFF).astype(np.uint8).tobytes())
    body = zlib.compress(b"".join(rows))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body)
            + chunk(b"IEND", b""))


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int, int]":
    """PCM WAV bytes -> (interleaved float64 samples in [-1, 1],
    sample_rate, channels) — pure stdlib ``wave``.  8/16/32-bit PCM;
    anything else raises into the stage quarantine."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        nf, sr, ch, sw = (w.getnframes(), w.getframerate(),
                          w.getnchannels(), w.getsampwidth())
        raw = w.readframes(nf)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        x -= 128.0
    x /= float(2 ** (8 * sw - 1))
    return x, sr, ch


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """float[-1,1] mono -> 16-bit PCM WAV bytes (stdlib; test fixture +
    example of the payload contract)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((np.clip(samples, -1, 1)
                       * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) array -> binary PPM bytes."""
    h, w, _ = pixels.shape
    return (f"P6\n{w} {h}\n255\n".encode()
            + pixels.astype(np.uint8).tobytes())


# --------------------------------------------------- audio spectral stage
class AudioFeaturizer:
    """Spectral feature extraction over PCM WAV payloads — the speech-
    pipeline analogue of the image decode stage (filterbank front-end a
    real pipeline would feed to a VAD / language-ID / ASR model).

    Pure numpy: Hann-windowed framed rFFT power spectra averaged over
    frames, reduced to a fixed 14-float vector per payload:

      [duration_s, sample_rate, channels, rms, zero_cross_rate,
       centroid_hz, bandwidth_hz, rolloff85_hz, flatness,
       band0..band3 energy fractions (equal quarters of [0, sr/2]),
       n_frames]

    Actor-pool stage (windows precomputed per frame size in ``__init__``
    cache); quarantine contract identical to ``MediaDecoder`` (X106):
    a malformed payload yields ``ok=False`` + ``err``, never a raise.
    """

    DIM = 14

    def __init__(self, frame: int = 256, hop: int = 128):
        self.frame = int(frame)
        self.hop = int(hop)
        self.window = np.hanning(self.frame)

    def _features(self, payload: bytes) -> np.ndarray:
        x, sr, ch = decode_wav(payload)
        if ch > 1:  # interleaved -> mono mixdown
            x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
        dur = len(x) / sr if sr else 0.0
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        zcr = (float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
               if len(x) > 1 else 0.0)
        if len(x) < self.frame:
            x = np.pad(x, (0, self.frame - len(x)))
        frames = np.lib.stride_tricks.sliding_window_view(
            x, self.frame)[::self.hop]
        spec = np.abs(np.fft.rfft(frames * self.window, axis=1)) ** 2
        spec = spec.mean(axis=0)
        freqs = np.fft.rfftfreq(self.frame, d=1.0 / sr if sr else 1.0)
        total = float(spec.sum())
        if total > 0.0:
            centroid = float((freqs * spec).sum() / total)
            bandwidth = float(np.sqrt(
                ((freqs - centroid) ** 2 * spec).sum() / total))
            rolloff = float(freqs[int(np.searchsorted(
                np.cumsum(spec), 0.85 * total))])
            body = spec[1:]  # DC excluded from the flatness ratio
            flatness = float(np.exp(np.mean(np.log(body + 1e-12)))
                             / (body.mean() + 1e-12))
            # equal quarters of [0, sr/2]; digitize the bin freqs once
            edges = np.array([0.25, 0.5, 0.75]) * (sr / 2.0)
            bands = np.bincount(np.digitize(freqs, edges),
                                weights=spec, minlength=4) / total
        else:
            centroid = bandwidth = rolloff = flatness = 0.0
            bands = np.zeros(4)
        return np.array([dur, float(sr), float(ch), rms, zcr,
                         centroid, bandwidth, rolloff, flatness,
                         *bands.tolist(), float(len(frames))])

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, oks, errs = [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                feats.append(self._features(payload))
                oks.append(True)
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine, not crash
                feats.append(np.zeros(self.DIM))
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}"[:200])
        flat = pa.array(np.concatenate(feats) if feats else np.zeros(0),
                        pa.float64())
        return pa.table({
            "media_id": batch.column("media_id"),
            "features": pa.FixedSizeListArray.from_arrays(flat, self.DIM),
            "ok": pa.array(oks, pa.bool_()),
            "err": pa.array(errs, pa.string()),
        })


def audio_features(ds, *, frame: int = 256, hop: int = 128,
                   batch_size: int = 64, concurrency: int = 2):
    """The audio spectral-feature stage: small batches (wide binary
    rows), actor pool, fixed-dim typed output."""
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"frame": frame, "hop": hop},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def _pnm_header(payload: bytes, off: int = 0):
    """Walk a binary PPM(P6)/PGM(P5) header starting at ``off``:
    returns (w, h, maxval, channels, data_off).  ONE implementation —
    the features, frame-size and resize decoders all parse the same
    whitespace/comment grammar, so a header fix lands everywhere."""
    if payload[off:off + 2] not in (b"P6", b"P5"):
        raise NotImplementedError("not a binary PNM frame")
    tokens: list[bytes] = []
    i = off + 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    ch = 3 if payload[off:off + 2] == b"P6" else 1
    return w, h, maxval, ch, i


def _pnm_frame_size(payload: bytes, off: int) -> int:
    """Byte length of the PPM/PGM frame starting at ``off`` (header parse
    only — no pixel decode)."""
    w, h, _maxval, ch, i = _pnm_header(payload, off)
    return (i - off) + w * h * ch


class FrameSampler:
    """Actor-pool UDF: video payload -> every ``stride``-th frame's
    features.  Real frame sampling (offset walk + per-frame decode) for
    the stdlib-parseable concatenated-PNM container; compressed video
    (H.264/VP9) raises — those decoders are not in this environment and
    would plug into ``_decode_real``'s dispatch the same way.

    Scale notes: one video row explodes into many frame rows, so callers
    use a SMALL batch_size; the sampler walks headers and decodes ONLY
    sampled frames (a compressed-video version would seek keyframes the
    same way)."""

    def __init__(self, stride: int = 5, feature_dim: int = 8):
        self.stride = stride
        self.dec = MediaDecoder(impl="real", feature_dim=feature_dim)
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Quarantine contract (same as MediaDecoder): a video whose
        container walk or frame decode fails emits ONE row with
        ``frame_idx=-1, ok=False, err=...`` (frames already sampled from
        it are dropped — partial output would double-count on retry);
        good videos emit their sampled frames with ``ok=True``."""
        ids, fidx, feats, oks, errs = [], [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            rows: list = []
            try:
                if payload[:6] in (b"GIF87a", b"GIF89a"):
                    # animated GIF: every frame must be composited in
                    # order (disposal semantics), so decode all and
                    # keep the sampled ones
                    from search_engine_ray.ops.gif import decode_gif_frames

                    for k, frame in enumerate(decode_gif_frames(payload)):
                        if k % self.stride == 0:
                            rows.append(
                                (k, self.dec._frame_features(frame)))
                else:
                    off, k = 0, 0
                    while off < len(payload):
                        size = _pnm_frame_size(payload, off)
                        if k % self.stride == 0:
                            f = self.dec._pnm_features(
                                payload[off:off + size])
                            rows.append((k, f))
                        off += size
                        k += 1
            except Exception as e:  # noqa: BLE001 — quarantine, not crash
                ids.append(mid)
                fidx.append(-1)
                feats.append(np.zeros(self.dim))
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}"[:200])
                continue
            for k, f in rows:
                ids.append(mid)
                fidx.append(k)
                feats.append(f)
                oks.append(True)
                errs.append(None)
        flat = pa.array(np.concatenate(feats) if feats else
                        np.zeros(0), pa.float64())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "features": pa.FixedSizeListArray.from_arrays(flat, self.dim),
            "ok": pa.array(oks, pa.bool_()),
            "err": pa.array(errs, pa.string()),
        })


def sample_frames(ds, *, stride: int = 5, batch_size: int = 8,
                  concurrency: int = 2):
    """Frame-sampling stage over a (media_id, payload) video Dataset."""
    return ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def encode_pnm_video(frames: "list[np.ndarray]") -> bytes:
    """Concatenated binary-PPM container (the stdlib-parseable stand-in
    for a video payload)."""
    return b"".join(encode_ppm(f) for f in frames)


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(100, 5000, size=n)]
    import json

    metas = [json.dumps({"w": int(rng.integers(16, 512)),
                         "h": int(rng.integers(16, 512))}) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, pa.string()),
    })


def decode_image(payload: bytes) -> np.ndarray:
    """(h, w, ch) uint8 pixels from any stdlib-decodable still-image
    payload (PNG, binary PPM/PGM, baseline JPEG, GIF first frame);
    raises into the callers' quarantine contract otherwise."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] in (b"P6", b"P5"):
        w, h, _maxval, ch, i = _pnm_header(payload)
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                           offset=i)
        return px.reshape(h, w, ch)
    if payload[:2] == b"\xff\xd8":
        from search_engine_ray.ops.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from search_engine_ray.ops.gif import decode_gif

        return np.ascontiguousarray(decode_gif(payload)[:, :, :3])
    raise NotImplementedError("unsupported image payload")


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash, the classic perceptual image
    fingerprint): grayscale -> 8x9 box-average grid -> horizontal
    gradient sign bits.  Deterministic and EXACTLY invariant to uniform
    brightness shifts (gradient signs unchanged), integer pixel
    doubling of grid-aligned dims (h % 8 == 0 and w % 9 == 0 keep the
    box partition identical, so box means are equal; other dims stay
    NEAR-invariant — a few boundary pixels change bucket) and format
    re-encodes that preserve pixels (PNG <-> PPM) — the dup classes a
    crawl actually contains.
    Works for any source dims via index-bucketed box averaging (no
    resize precondition)."""
    px = np.asarray(img, dtype=np.float64)
    gray = px.mean(axis=2) if px.ndim == 3 else px
    h, w = gray.shape
    if h == 0 or w == 0:
        return 0
    rows = (np.arange(h, dtype=np.int64) * 8) // h
    cols = (np.arange(w, dtype=np.int64) * 9) // w
    key = rows[:, None] * 9 + cols[None, :]
    sums = np.bincount(key.ravel(), weights=gray.ravel(), minlength=72)
    cnts = np.bincount(key.ravel(), minlength=72)
    g = (sums / np.maximum(cnts, 1)).reshape(8, 9)
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class ImageHasher:
    """Actor-pool UDF: encoded image payload -> 64-bit dHash
    fingerprint, X106 quarantine contract (a corrupt payload yields
    ok=False + err, never a stage crash)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes, oks, errs = [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            ids.append(mid)
            try:
                hashes.append(dhash64(decode_image(payload)))
                oks.append(True)
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine, not crash
                hashes.append(0)
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}"[:200])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "dhash": pa.array(np.array(hashes, np.uint64).view(np.int64),
                              pa.int64()),
            "ok": pa.array(oks, pa.bool_()),
            "err": pa.array(errs, pa.string()),
        })


def image_dhash(ds, *, batch_size: int = 16, concurrency: int = 2):
    """dHash fingerprint stage over a (media_id, payload) dataset."""
    return ds.map_batches(ImageHasher, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def image_near_dups(ds, *, max_hamming: int = 6, max_bucket: int = 256,
                    batch_size: int = 16, concurrency: int = 2):
    """Image near-duplicate pairs by dHash Hamming distance — the
    image-side sibling of the text simhash dedup, sharing its banded
    machinery: 8 bands x 8 bits, so any pair within hamming <= 7
    collides in at least one band EXACTLY (pigeonhole — recall 1.0 at
    the default threshold, no probabilistic LSH miss).  Quarantined
    (undecodable) payloads are excluded from banding.  Returns a
    Dataset (a, b, hamming), a < b, deduped across bands."""
    from search_engine_ray.ops.dedup import (
        _dedup_pairs,
        _hamming_bucket_pairs_fn,
    )
    from search_engine_ray.ops.shuffle import grouped_apply

    hashed = image_dhash(ds, batch_size=batch_size,
                         concurrency=concurrency)

    def band_rows(batch: pa.Table) -> pa.Table:
        ok = batch.column("ok").to_numpy(zero_copy_only=False)
        ids = batch.column("media_id").to_numpy(
            zero_copy_only=False)[ok]
        hs = batch.column("dhash").to_numpy(
            zero_copy_only=False)[ok].view(np.uint64)
        n = len(ids)
        bands = np.tile(np.arange(8, dtype=np.int32), n)
        hs_rep = np.repeat(hs, 8)
        keys = ((hs_rep >> (8 * bands.astype(np.uint64)))
                & np.uint64(0xFF)).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 8), pa.int64()),
            "dhash": pa.array(hs_rep.view(np.int64), pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "key": pa.array(keys, pa.int32()),
        })

    rows = hashed.map_batches(band_rows, batch_format="pyarrow")
    cand = grouped_apply(
        rows, ["band", "key"],
        _hamming_bucket_pairs_fn(max_hamming, max_bucket,
                                 hash_col="dhash"))
    return _dedup_pairs(cand)


class ImageResizer:
    """Actor-pool UDF: encoded image payload -> box-average-downsampled
    PNG.  Real resize for the stdlib-decodable formats (PNG, binary
    PPM/PGM); the resample is exact area averaging when the source dims
    are integer multiples of the target, else nearest-neighbor on a box
    grid — all numpy, no image libs.

    Output rows keep the binary-payload contract (re-encoded PNG), so
    resize stages compose with decode/feature stages downstream."""

    def __init__(self, target_h: int = 32, target_w: int = 32):
        self.th, self.tw = target_h, target_w

    def _decode(self, payload: bytes) -> np.ndarray:
        return decode_image(payload)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w, ch = img.shape
        th, tw = self.th, self.tw
        if h % th == 0 and w % tw == 0:
            # exact box average over (h/th x w/tw) blocks
            bh, bw = h // th, w // tw
            out = (img.reshape(th, bh, tw, bw, ch).astype(np.float64)
                   .mean(axis=(1, 3)))
            return np.floor(out + 0.5).astype(np.uint8)
        # nearest-neighbor grid sample
        ys = np.minimum((np.arange(th) * h) // th, h - 1)
        xs = np.minimum((np.arange(tw) * w) // tw, w - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Quarantine contract (same as MediaDecoder): undecodable images
        get ``ok=False`` + ``err`` and an empty payload instead of
        killing the stage."""
        ids, payloads, oks, errs = [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            ids.append(mid)
            try:
                payloads.append(encode_png(
                    self._resize(self._decode(payload))))
                oks.append(True)
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine, not crash
                payloads.append(b"")
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}"[:200])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "height": pa.array([self.th] * len(ids), pa.int64()),
            "width": pa.array([self.tw] * len(ids), pa.int64()),
            "ok": pa.array(oks, pa.bool_()),
            "err": pa.array(errs, pa.string()),
        })


def resize_images(ds, *, target_h: int = 32, target_w: int = 32,
                  batch_size: int = 16, concurrency: int = 2):
    """Image resize stage: small batches (binary rows), actor pool,
    re-encoded PNG output."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_h": target_h, "target_w": target_w},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
