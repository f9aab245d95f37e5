"""Multimodal column plumbing: decode / feature-extract / resize stages.

Treats image/audio payloads as typed ``binary`` columns processed by
actor-pool ``map_batches`` stages.  The decode seam is REAL for two
image formats: uncompressed PPM (P6) — a pure-numpy parser/encoder —
and compressed PNG — a stdlib-only decoder (zlib inflate + IHDR/IDAT
chunk walk + scanline unfilter) covering 8-bit gray/RGB/RGBA,
non-interlaced, all five filters — and for PCM WAV audio (RIFF chunk
walk, 16-bit, any channel count).  Dimension extraction,
channel/luminance/sample features, and nearest-neighbor resize operate
on actual pixels/samples.  Formats needing codec libraries this
container lacks (JPEG, compressed audio, video) remain behind the
clearly marked seam:
deterministic fake decode (shape + checksum derived from the bytes) and
``strict`` mode raising ``NotImplementedError`` where PIL / soundfile /
av would plug in.

Sizing note (SURVEY §4.2 / guide): binary payload rows are FAT — this
stage must run with a SMALL ``batch_size`` (default 16) and row-based
batching so one batch x pool concurrency stays inside a worker heap.
"""

from __future__ import annotations

import hashlib
import struct as _struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),  # "image" | "audio"
        ("payload", pa.binary()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("checksum", pa.string()),
        ("feature", pa.list_(pa.float64())),
    ]
)


def media_from_documents(docs, n: int = 32) -> "ray.data.Dataset":
    """Derive a media table from the ``documents`` table: the first ``n``
    docs become one media item each, payload = the document's UTF-8
    bytes.  This makes the media pipeline's INPUT a pure function of a
    SQL-visible table, so the stub codec's outputs (md5-derived shapes,
    checksums, features) have exact DuckDB twins — the codec itself is
    still the documented fake behind the ``strict`` seam."""
    import pyarrow.compute as pc

    def to_media(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["doc_id"], n))
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        return pa.Table.from_pydict(
            {
                "media_ref": [f"media://doc/{d}" for d in ids],
                "kind": ["image" if d % 2 == 0 else "audio" for d in ids],
                "payload": [t.encode("utf-8") for t in texts],
            },
            schema=MEDIA_SCHEMA,
        )

    return docs.map_batches(to_media, batch_format="pyarrow")


def synth_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic fake media payloads (for plumbing tests/benchmarks)."""
    rng = np.random.default_rng(seed)
    refs, kinds, payloads = [], [], []
    for i in range(n):
        kind = "image" if i % 2 == 0 else "audio"
        size = int(rng.integers(256, 4096))
        payloads.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
        refs.append(f"media://synth/{i}")
        kinds.append(kind)
    return pa.Table.from_pydict(
        {"media_ref": refs, "kind": kinds, "payload": payloads},
        schema=MEDIA_SCHEMA,
    )


# Exact DuckDB twins over the SQL-comparable projections of the three
# media stages: the media table derives from documents
# (media_from_documents), payload = UTF-8 text bytes, and every stub
# output is md5 arithmetic DuckDB can replay ('0x'||substr(md5(text),..)
# per byte).  The binary payload columns are excluded (pytest covers
# them); the codec remains a documented stub.
_MEDIA_BASE_CTE = """
WITH m AS (
  SELECT 'media://doc/' || doc_id AS media_ref,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         md5(text) AS h
  FROM documents WHERE doc_id < 32
)
"""

MEDIA_FEATURES_SQL = _MEDIA_BASE_CTE + """
SELECT media_ref, kind,
       CAST(16 + ('0x' || substr(h, 1, 2))::INT AS INTEGER) AS width,
       CAST(16 + ('0x' || substr(h, 3, 2))::INT AS INTEGER) AS height,
       h AS checksum,
       list_aggregate([('0x' || substr(h, 2*i+1, 2))::INT
                       for i in generate_series(0, 15)], 'sum') / 4080.0
         AS feature_mean
FROM m
"""

MEDIA_RESIZE_SQL = _MEDIA_BASE_CTE + """,
dims AS (
  SELECT media_ref, kind,
         16 + ('0x' || substr(h, 1, 2))::INT AS w,
         16 + ('0x' || substr(h, 3, 2))::INT AS hh
  FROM m
)
SELECT media_ref, kind,
       CAST(greatest(1, floor(w * (64.0 / greatest(w, hh)))) AS INTEGER)
         AS width,
       CAST(greatest(1, floor(hh * (64.0 / greatest(w, hh)))) AS INTEGER)
         AS height
FROM dims
"""

MEDIA_FRAMES_SQL = _MEDIA_BASE_CTE + """,
d AS (
  SELECT media_ref,
         1000 + ('0x' || substr(h, 1, 4))::INT % 29000 AS dur
  FROM m
)
SELECT media_ref,
       CAST(i AS INTEGER) AS frame_index,
       CAST((i * dur) // 4 AS INTEGER) AS timestamp_ms
FROM d, generate_series(0, 3) AS g(i)
"""


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 array as a binary PPM (P6) stream."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def try_decode_ppm(payload: bytes):
    """Pure-numpy P6 parser: ``(w, h, pixels)`` or None if not valid PPM.

    Only the canonical header layout this module's encoder emits is
    accepted (magic, one dims line, maxval 255, raw RGB); anything else
    — including text payloads that merely start with 'P6' — falls
    through to None and the stub/strict path."""
    if not payload.startswith(b"P6\n"):
        return None
    parts = payload.split(b"\n", 3)
    if len(parts) < 4 or parts[2].strip() != b"255":
        return None
    try:
        w, h = (int(x) for x in parts[1].split())
    except ValueError:
        return None
    raw = parts[3]
    if w <= 0 or h <= 0 or len(raw) != w * h * 3:
        return None
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# PNG codec — REAL, stdlib-only (zlib inflate + struct): the one
# compressed image format this environment does not force behind the
# strict seam (round-3 verdict item 4).  Supports the non-interlaced
# 8-bit color types (gray 0, RGB 2, RGBA 6) and all five scanline
# filters; everything else returns None and falls through to the
# documented strict/stub seam like any other foreign payload.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 array as a minimal valid PNG
    (8-bit RGB, filter 0 scanlines, one IDAT)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (_struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def try_decode_png(payload: bytes):
    """Pure stdlib PNG decoder: ``(w, h, rgb_pixels)`` or None.

    IHDR -> IDAT concat -> zlib inflate -> per-scanline unfilter
    (None/Sub/Up/Average/Paeth).  Gray expands to RGB; RGBA drops alpha
    (features are channel statistics, not compositing).  Sub and Up are
    vectorized (uint8 accumulate wraps mod 256 by construction); Average
    and Paeth keep the spec's sequential per-byte recurrence — they are
    decode-seam code, not a shuffle hot path."""
    if not payload.startswith(_PNG_SIG):
        return None
    pos, ihdr, idat = len(_PNG_SIG), None, []
    try:
        while pos + 8 <= len(payload):
            (length,), tag = _struct.unpack(">I", payload[pos:pos + 4]), \
                payload[pos + 4:pos + 8]
            body = payload[pos + 8:pos + 8 + length]
            if len(body) != length:
                return None
            if tag == b"IHDR":
                ihdr = _struct.unpack(">IIBBBBB", body)
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + length
        if ihdr is None or not idat:
            return None
        w, h, depth, ctype, comp, filt, interlace = ihdr
        if (depth != 8 or ctype not in (0, 2, 6) or comp != 0
                or filt != 0 or interlace != 0 or w <= 0 or h <= 0):
            return None
        nch = {0: 1, 2: 3, 6: 4}[ctype]
        stride = w * nch
        expected = h * (stride + 1)
        if w * h > 2 ** 26:  # 67M pixels: beyond the decode stage's remit
            return None
        # bounded inflate: a zlib-bomb IDAT with a huge IHDR claim must
        # not allocate past what the (already-capped) header promises;
        # asking for expected+1 distinguishes oversized streams without
        # tripping on the adler trailer at an exact-size boundary
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected + 1)
        if len(raw) > expected:
            return None  # stream inflates past the header's size
    except (zlib.error, _struct.error):
        return None
    if len(raw) != expected:
        return None
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes, data = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        row = data[y].copy()
        ft = int(ftypes[y])
        if ft == 0:
            pass
        elif ft == 1:  # Sub: per-channel-lane prefix sum, mod 256 via uint8
            for b in range(nch):
                np.add.accumulate(row[b::nch], out=row[b::nch])
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(row[x - nch]) if x >= nch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - nch]) if x >= nch else 0
                c = int(prev[x - nch]) if x >= nch else 0
                row[x] = (int(row[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            return None
        out[y] = row
        prev = out[y]
    px = out.reshape(h, w, nch)
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    elif nch == 4:
        px = px[:, :, :3]
    return w, h, px


# ---------------------------------------------------------------------------
# WAV codec — REAL, stdlib-only (RIFF chunk walk + struct): uncompressed
# PCM is the one audio container that needs no codec library, so the
# audio half of the decode seam gets a real path too (the image half got
# PPM, then PNG).  16-bit PCM, any channel count, non-PCM formats return
# None and fall through to the seam.


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Serialize (n,) or (n, ch) int16 samples as a PCM WAV stream."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = _struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data)
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def try_decode_wav(payload: bytes):
    """Pure stdlib WAV/PCM parser: ``(rate, samples[n, ch] int16)`` or
    None for anything that is not an uncompressed 16-bit PCM RIFF."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, ch, bits, data = 12, None, None, None, None
    try:
        while pos + 8 <= len(payload):
            tag = payload[pos:pos + 4]
            (length,) = _struct.unpack("<I", payload[pos + 4:pos + 8])
            body = payload[pos + 8:pos + 8 + length]
            if len(body) != length:
                return None
            if tag == b"fmt ":
                if length < 16:
                    return None
                audio_fmt, ch, rate, _, _, bits = _struct.unpack(
                    "<HHIIHH", body[:16])
                if audio_fmt != 1 or bits != 16:
                    return None
            elif tag == b"data":
                data = body
            pos += 8 + length + (length & 1)  # chunks are word-aligned
    except _struct.error:
        return None
    if rate is None or data is None or ch in (None, 0):
        return None
    if rate == 0 or rate > 2 ** 31 - 1:
        # a zero rate would divide-by-zero the duration feature and a
        # >int32 rate overflows the height column: treat both as not-WAV
        # so the payload falls through to the stub/strict seam
        return None
    frame = ch * 2
    if len(data) % frame:
        return None
    samples = np.frombuffer(data, "<i2").reshape(-1, ch)
    return rate, samples


def sniff_decode_image(payload: bytes):
    """Dispatch over the REAL codecs: ``(w, h, pixels, fmt)`` with fmt in
    {'ppm', 'png'}, or None when the payload is neither."""
    ppm = try_decode_ppm(payload)
    if ppm is not None:
        return (*ppm, "ppm")
    png = try_decode_png(payload)
    if png is not None:
        return (*png, "png")
    return None


def _sniffed_format(payload: bytes):
    """Cheap HEADER-level format sniff: 'image' for P6/PNG magic, 'audio'
    for RIFF/WAVE, else None.  O(1) — used only to detect payloads whose
    declared ``kind`` contradicts their container (strict mode), so no
    full decode is spent on a row the stage will reject anyway."""
    if payload.startswith(b"P6\n") or payload.startswith(_PNG_SIG):
        return "image"
    if len(payload) >= 12 and payload[:4] == b"RIFF" \
            and payload[8:12] == b"WAVE":
        return "audio"
    return None


def _check_kind_contradiction(payload: bytes, kind: str, strict: bool):
    """Shared strict-mode gate for DecodeStub / ResizeStub: a payload
    whose container sniff disagrees with the declared kind is an error,
    not a silent fallback (round-3 advice)."""
    if not strict:
        return
    fmt = _sniffed_format(payload)
    if fmt is not None and fmt != kind:
        raise ValueError(
            f"payload sniffs as {fmt} but is declared kind={kind!r}")


def synth_ppm_media_table(n: int = 8, seed: int = 42) -> pa.Table:
    """Deterministic REAL PPM images (gradient + seeded noise) for the
    real-decode path."""
    rng = np.random.default_rng(seed)
    refs, kinds, payloads = [], [], []
    for i in range(n):
        w = int(rng.integers(8, 48))
        h = int(rng.integers(8, 48))
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(xx * 255 // max(1, w - 1)).astype(np.uint8),
             (yy * 255 // max(1, h - 1)).astype(np.uint8),
             rng.integers(0, 256, (h, w), dtype=np.uint8)],
            axis=-1)
        refs.append(f"media://ppm/{i}")
        kinds.append("image")
        payloads.append(encode_ppm(px))
    return pa.Table.from_pydict(
        {"media_ref": refs, "kind": kinds, "payload": payloads},
        schema=MEDIA_SCHEMA,
    )


class DecodeStub:
    """Actor-pool decode/feature stage.

    ``__init__`` is where a real implementation loads codecs / models once
    per actor; ``__call__`` decodes and featurizes a batch.  PPM (P6)
    payloads take the REAL path: parsed pixels, channel means, a 12-bin
    luminance histogram.  For other formats ``strict=True`` raises
    ``NotImplementedError`` at the decode seam instead of faking — that
    is the line a real deployment replaces with PIL / soundfile.
    """

    FEATURE_DIM = 16

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _decode(self, payload: bytes, kind: str):
        # the declared kind gates the codec dispatch: a non-image payload
        # that happens to carry a valid P6/PNG header must NOT be
        # silently decoded as pixels (round-3 advice); strict mode flags
        # the contradiction via a cheap header sniff
        _check_kind_contradiction(payload, kind, self.strict)
        img = sniff_decode_image(payload) if kind == "image" else None
        wav = try_decode_wav(payload) if kind == "audio" else None
        if wav is not None:
            # REAL audio path: exact integer sums -> one float op each,
            # so the closed-form SQL twin reproduces the doubles
            # bit-for-bit (same shape as the image channel means)
            rate, samples = wav
            s = samples[:, 0].astype(np.int64)
            n = len(s)
            ssum, ssq = int(s.sum()), int((s * s).sum())
            zc = int(((s[1:] >= 0) != (s[:-1] >= 0)).sum()) if n > 1 else 0
            import math

            hist, _ = np.histogram(
                s / 32768.0, bins=12, range=(-1.0, 1.0))
            feat = np.concatenate([
                [n / rate,
                 (ssum / n) / 32768.0 if n else 0.0,
                 math.sqrt(ssq / n) / 32768.0 if n else 0.0,
                 zc / (n - 1) if n > 1 else 0.0],
                hist.astype(np.float64) / max(n, 1),
            ])
            return (min(n, 2 ** 31 - 1), rate,
                    hashlib.md5(payload).hexdigest(), feat)
        if img is not None:
            w, h, px, _fmt = img
            lum = px.astype(np.float64).mean(axis=-1) / 255.0
            hist, _ = np.histogram(lum, bins=12, range=(0.0, 1.0))
            feat = np.concatenate([
                px.reshape(-1, 3).astype(np.float64).mean(axis=0) / 255.0,
                [w / h],
                hist.astype(np.float64) / lum.size,
            ])
            return w, h, hashlib.md5(payload).hexdigest(), feat
        if self.strict:
            raise NotImplementedError(
                "real image/audio codecs are not available in this environment; "
                "plug a decoder in here (e.g. PIL.Image.open / soundfile.read)"
            )
        # deterministic fake: dimensions + features derived from content.
        # md5 rather than blake2b so the DuckDB oracle recomputes the
        # identical values from the payload's source text
        # (('0x' || substr(md5(text), 2i+1, 2))::INT per byte)
        digest = hashlib.md5(payload).digest()
        w = 16 + digest[0]
        h = 16 + digest[1]
        feat = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
        return w, h, digest.hex(), feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in FEATURE_SCHEMA.names}
        for ref, kind, payload in zip(
            batch["media_ref"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            w, h, checksum, feat = self._decode(payload, kind)
            rows["media_ref"].append(ref)
            rows["kind"].append(kind)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["checksum"].append(checksum)
            rows["feature"].append(feat.tolist())
        return pa.Table.from_pydict(rows, schema=FEATURE_SCHEMA)


def decode_features(
    media: ray.data.Dataset,
    batch_size: int = 16,
    concurrency=2,
) -> ray.data.Dataset:
    """The media decode pipeline stage: small batches (fat binary rows),
    actor pool for per-actor codec state."""
    return media.map_batches(
        DecodeStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


RESIZED_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),
    ]
)

FRAME_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("frame_index", pa.int32()),
        ("timestamp_ms", pa.int32()),
        ("payload", pa.binary()),
    ]
)


class ResizeStub:
    """Actor-pool resize stage (images): same plumbing contract as
    ``DecodeStub`` — real codec goes behind the ``strict`` seam; the fake
    is deterministic (target box + content-derived bytes)."""

    def __init__(self, max_side: int = 64, strict: bool = False):
        self.max_side = max_side
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in RESIZED_SCHEMA.names}
        for ref, kind, payload in zip(
            batch["media_ref"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            _check_kind_contradiction(payload, kind, self.strict)
            img = sniff_decode_image(payload) if kind == "image" else None
            if img is not None:
                # REAL path: nearest-neighbor resample of actual pixels,
                # re-encoded in the SOURCE container (P6 in -> P6 out,
                # PNG in -> PNG out)
                w, h, px, fmt = img
                scale = self.max_side / max(w, h)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                ys = (np.arange(nh) * h) // nh
                xs = (np.arange(nw) * w) // nw
                out = px[ys][:, xs]
                rows["media_ref"].append(ref)
                rows["kind"].append(kind)
                rows["width"].append(nw)
                rows["height"].append(nh)
                rows["payload"].append(
                    encode_png(out) if fmt == "png" else encode_ppm(out))
                continue
            if self.strict:
                raise NotImplementedError(
                    "plug a real resampler in here (e.g. PIL Image.resize)"
                )
            # md5-derived source dims: the DuckDB twin recomputes them
            digest = hashlib.md5(payload).digest()
            w, h = 16 + digest[0], 16 + digest[1]
            scale = self.max_side / max(w, h)
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            fake = hashlib.blake2b(
                payload + b"|resize|%d" % self.max_side, digest_size=32
            ).digest()
            rows["media_ref"].append(ref)
            rows["kind"].append(kind)
            rows["width"].append(nw)
            rows["height"].append(nh)
            rows["payload"].append(fake)
        return pa.Table.from_pydict(rows, schema=RESIZED_SCHEMA)


class FrameSampleStub:
    """Actor-pool frame-sampling stage (video/audio): emits N evenly
    spaced frames per item (1:N flat-map shape — one input row becomes
    several output rows).  REAL for PCM WAV payloads: each frame is an
    actual evenly-spaced window of the samples, re-encoded as a valid
    WAV clip, timestamped from the true sample rate.  Other containers
    get deterministic fake frames behind the seam.

    The WAV path is gated on the declared ``kind`` — an image/video-kind
    payload that happens to sniff as RIFF/WAVE must not be silently
    frame-sampled as audio — and strict mode applies the same
    kind-contradiction check as DecodeStub/ResizeStub (round-4 advice)."""

    def __init__(self, frames_per_item: int = 4, strict: bool = False):
        self.n = frames_per_item
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in FRAME_SCHEMA.names}
        for ref, kind, payload in zip(
            batch["media_ref"].to_pylist(), batch["kind"].to_pylist(),
            batch["payload"].to_pylist()
        ):
            _check_kind_contradiction(payload, kind, self.strict)
            wav = try_decode_wav(payload) if kind == "audio" else None
            if wav is not None:
                # REAL path: slice the actual samples into n windows
                rate, samples = wav
                total = len(samples)
                for i in range(self.n):
                    lo = i * total // self.n
                    hi = max((i + 1) * total // self.n, lo)
                    rows["media_ref"].append(ref)
                    rows["frame_index"].append(i)
                    rows["timestamp_ms"].append(int(lo * 1000 // rate))
                    rows["payload"].append(
                        encode_wav(np.ascontiguousarray(samples[lo:hi]),
                                   rate=rate))
                continue
            if self.strict:
                raise NotImplementedError(
                    "plug a real demuxer in here (e.g. av / ffmpeg bindings)"
                )
            # fake duration derived from content: 1-30s (md5 head, not
            # raw payload bytes, so the SQL twin avoids multibyte-text
            # slicing pitfalls)
            dur_ms = 1000 + int.from_bytes(
                hashlib.md5(payload).digest()[:2], "big") % 29000
            for i in range(self.n):
                ts = i * dur_ms // self.n
                frame = hashlib.blake2b(
                    payload + b"|frame|%d" % i, digest_size=32
                ).digest()
                rows["media_ref"].append(ref)
                rows["frame_index"].append(i)
                rows["timestamp_ms"].append(ts)
                rows["payload"].append(frame)
        return pa.Table.from_pydict(rows, schema=FRAME_SCHEMA)


def resize_images(media: ray.data.Dataset, max_side: int = 64,
                  batch_size: int = 16, concurrency=2) -> ray.data.Dataset:
    return media.map_batches(
        ResizeStub, fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def sample_frames(media: ray.data.Dataset, frames_per_item: int = 4,
                  batch_size: int = 16, concurrency=2) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampleStub,
        fn_constructor_kwargs={"frames_per_item": frames_per_item},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def _gradient_px(d: int) -> np.ndarray:
    """The shared deterministic gradient image for doc ``d``:
    ``w = 8 + d % 8``, ``h = 8 + d % 5``, channels ``R = x*255 // (w-1)``,
    ``G = y*255 // (h-1)``, ``B = x + y`` (always < 256 at these dims).
    ONE definition feeds both the PPM and PNG fixtures — the
    pixel-identical premise their two SQL twins rely on."""
    w, h = 8 + d % 8, 8 + d % 5
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 // (w - 1)).astype(np.uint8),
         (yy * 255 // (h - 1)).astype(np.uint8),
         (xx + yy).astype(np.uint8)],
        axis=-1)


def _synth_media_from_documents(docs, n: int, prefix: str, kind: str,
                                payload_fn) -> "ray.data.Dataset":
    """Shared scaffold for the deterministic real-codec fixtures: filter
    doc_id < n, derive one payload per doc via ``payload_fn(doc_id)``."""
    import pyarrow.compute as pc

    def to_media(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["doc_id"], n))
        ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict(
            {"media_ref": [f"media://{prefix}/{d}" for d in ids],
             "kind": [kind] * len(ids),
             "payload": [payload_fn(d) for d in ids]},
            schema=MEDIA_SCHEMA,
        )

    return docs.map_batches(to_media, batch_format="pyarrow")


def ppm_media_from_documents(docs, n: int = 16) -> "ray.data.Dataset":
    """REAL PPM images derived deterministically from the documents
    table (gradient pixels, see ``_gradient_px``).  Pure integer
    arithmetic, so the channel means the real decoder extracts have
    closed-form SQL twins — the media pipeline's hash oracle runs
    through ACTUAL pixels, not stub arithmetic."""
    return _synth_media_from_documents(
        docs, n, "ppm-doc", "image", lambda d: encode_ppm(_gradient_px(d)))


# Closed-form twin of the REAL pixel statistics: the gradient images'
# channel sums are integer expressions (generate_series for the
# floor-division gradient, triangular numbers for B = x + y), and the
# decoder's mean is one exact-int division then /255.0 — replicated
# with the identical operation shape here.
PPM_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id, 'media://ppm-doc/' || doc_id AS media_ref,
         8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
  FROM documents WHERE doc_id < 16
),
-- this DuckDB build rejects column-correlated generate_series bounds,
-- so the gradient sums cross-join a CONSTANT series (0..max dim - 1)
-- and filter to each image's actual width/height
xs AS (
  SELECT doc_id, sum((g.x * 255) // (w - 1)) AS sx
  FROM m, generate_series(0, 14) g(x) WHERE g.x <= w - 1
  GROUP BY doc_id
),
ys AS (
  SELECT doc_id, sum((g.y * 255) // (h - 1)) AS sy
  FROM m, generate_series(0, 11) g(y) WHERE g.y <= h - 1
  GROUP BY doc_id
),
sums AS (
  SELECT m.doc_id, media_ref, w, h,
         h * sx AS s_r,
         w * sy AS s_g,
         h * (w * (w - 1)) // 2 + w * (h * (h - 1)) // 2 AS s_b
  FROM m JOIN xs ON m.doc_id = xs.doc_id JOIN ys ON m.doc_id = ys.doc_id
)
SELECT media_ref,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       (CAST(s_r AS DOUBLE) / (w * h)) / 255.0 AS mean_r,
       (CAST(s_g AS DOUBLE) / (w * h)) / 255.0 AS mean_g,
       (CAST(s_b AS DOUBLE) / (w * h)) / 255.0 AS mean_b,
       CAST(w AS DOUBLE) / h AS aspect
FROM sums
"""


def png_media_from_documents(docs, n: int = 16) -> "ray.data.Dataset":
    """REAL PNG images with the same deterministic gradient pixels as
    ``ppm_media_from_documents`` (one ``_gradient_px`` definition) — the
    decode path here runs the full compressed route (zlib inflate +
    chunk walk + unfilter), so the hash oracle proves the PNG codec on
    actual compressed bytes."""
    return _synth_media_from_documents(
        docs, n, "png-doc", "image", lambda d: encode_png(_gradient_px(d)))


# Same closed-form pixel statistics as PPM_FEATURES_SQL — the images are
# pixel-identical, only the container (and therefore the decode route)
# differs, which is exactly what makes this a codec oracle.
PNG_FEATURES_SQL = PPM_FEATURES_SQL.replace("media://ppm-doc/",
                                            "media://png-doc/")


def png_features(docs) -> "ray.data.Dataset":
    """Real compressed-decode feature query: gradient PNGs from documents
    through the actor-pool decode stage (zlib inflate + unfilter),
    projected to the SQL-comparable channel statistics."""
    feats = decode_features(png_media_from_documents(docs))

    def project(batch: pa.Table) -> pa.Table:
        f = batch["feature"].to_pylist()
        return pa.Table.from_pydict({
            "media_ref": batch["media_ref"],
            "width": batch["width"],
            "height": batch["height"],
            "mean_r": pa.array([v[0] for v in f], pa.float64()),
            "mean_g": pa.array([v[1] for v in f], pa.float64()),
            "mean_b": pa.array([v[2] for v in f], pa.float64()),
            "aspect": pa.array([v[3] for v in f], pa.float64()),
        })

    return feats.map_batches(project, batch_format="pyarrow")


def wav_media_from_documents(docs, n: int = 16,
                             rate: int = 8000) -> "ray.data.Dataset":
    """REAL PCM WAV clips derived deterministically from the documents
    table: doc_id < n becomes a sawtooth-ish integer waveform
    ``s_i = ((i * k) % 200 - 100) * 300`` with ``k = 3 + doc_id % 5``
    over ``n_samples = 64 + (doc_id % 8) * 16`` samples — pure integer
    arithmetic, so the decoder's mean/RMS have closed-form SQL twins."""
    def wave(d: int) -> bytes:
        k = 3 + d % 5
        ns = 64 + (d % 8) * 16
        i = np.arange(ns, dtype=np.int64)
        return encode_wav((((i * k) % 200 - 100) * 300).astype(np.int16),
                          rate=rate)

    return _synth_media_from_documents(docs, n, "wav-doc", "audio", wave)


# Closed-form twin of the REAL PCM statistics: sample sums over the
# integer waveform via a constant generate_series cross join (same
# pattern as PPM_FEATURES_SQL), one float op per feature replicating the
# decoder's expression shape exactly.
WAV_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id, 'media://wav-doc/' || doc_id AS media_ref,
         3 + doc_id % 5 AS k, 64 + (doc_id % 8) * 16 AS ns
  FROM documents WHERE doc_id < 16
),
s AS (
  SELECT doc_id,
         sum(((g.i * k) % 200 - 100) * 300) AS ssum,
         sum((((g.i * k) % 200 - 100) * 300)
             * (((g.i * k) % 200 - 100) * 300)) AS ssq
  FROM m, generate_series(0, 191) g(i) WHERE g.i < ns
  GROUP BY doc_id
)
SELECT media_ref,
       CAST(ns AS INTEGER) AS n_samples,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(ns AS DOUBLE) / 8000 AS duration_sec,
       (CAST(ssum AS DOUBLE) / ns) / 32768.0 AS mean_norm,
       sqrt(CAST(ssq AS DOUBLE) / ns) / 32768.0 AS rms
FROM m JOIN s USING (doc_id)
"""


def wav_features(docs) -> "ray.data.Dataset":
    """Real audio-decode feature query: deterministic PCM clips from
    documents through the actor-pool decode stage (RIFF parse), projected
    to the SQL-comparable sample statistics."""
    feats = decode_features(wav_media_from_documents(docs))

    def project(batch: pa.Table) -> pa.Table:
        f = batch["feature"].to_pylist()
        return pa.Table.from_pydict({
            "media_ref": batch["media_ref"],
            "n_samples": batch["width"],
            "sample_rate": batch["height"],
            "duration_sec": pa.array([v[0] for v in f], pa.float64()),
            "mean_norm": pa.array([v[1] for v in f], pa.float64()),
            "rms": pa.array([v[2] for v in f], pa.float64()),
        })

    return feats.map_batches(project, batch_format="pyarrow")


def ppm_features(docs) -> "ray.data.Dataset":
    """Real-decode feature query: gradient PPMs from documents through
    the actor-pool decode stage, projected to the SQL-comparable
    channel statistics."""
    feats = decode_features(ppm_media_from_documents(docs))

    def project(batch: pa.Table) -> pa.Table:
        f = batch["feature"].to_pylist()
        return pa.Table.from_pydict({
            "media_ref": batch["media_ref"],
            "width": batch["width"],
            "height": batch["height"],
            "mean_r": pa.array([v[0] for v in f], pa.float64()),
            "mean_g": pa.array([v[1] for v in f], pa.float64()),
            "mean_b": pa.array([v[2] for v in f], pa.float64()),
            "aspect": pa.array([v[3] for v in f], pa.float64()),
        })

    return feats.map_batches(project, batch_format="pyarrow")
