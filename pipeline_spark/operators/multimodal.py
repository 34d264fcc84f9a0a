"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested. Image decode is FEATURE-GATED
(:func:`resolve_decoder`): a cluster with PIL importable on its
executors gets real width/height/thumbnail features automatically; this
container has no codec libraries, so the default resolution lands on the
clearly-marked deterministic stub. Audio/video decode remains stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# Magic prefixes → media type (detection itself is real, not stubbed)
MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]

MEDIA_META_SCHEMA = (
    "media_type string, byte_len long, width int, height int, feature array<float>"
)


def detect_media_type(col) -> F.Column:
    """Magic-byte sniffing as a JVM expression (hex-prefix compare)."""
    hexed = F.hex(F.substring(col, 1, 8))
    out = F.lit("application/octet-stream")
    for magic, mt in reversed(MAGIC):
        out = F.when(hexed.startswith(F.lit(magic.hex().upper())), F.lit(mt)).otherwise(out)
    return out


def _decode_image_stub(data: bytes) -> tuple[int, int, list[float]]:
    """STUB — deterministic fake decode.

    Real implementation requires an image codec (PIL/turbojpeg) absent from
    this container. The fake derives (width, height, 4-dim feature) from
    the bytes deterministically so tests exercise the full Spark plumbing.
    """
    if not data:
        raise NotImplementedError("empty payload: real decoder required")
    w = 1 + data[0] % 64
    h = 1 + data[-1] % 64
    feat = [float(len(data) % 251), float(data[0]), float(data[-1]), float(w * h)]
    return w, h, feat


def _decode_image_pil(data: bytes) -> tuple[int, int, list[float]]:
    """Real decode via PIL (feature-gated: selected only when PIL imports
    on the EXECUTOR). Feature = 4-dim grayscale 2x2 thumbnail means — a
    deterministic, codec-faithful analog of the stub's shape so downstream
    schema/consumers are identical either way."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data))
    w, h = img.size
    thumb = img.convert("L").resize((2, 2))
    feat = [float(p) for p in thumb.getdata()]
    return w, h, feat


def resolve_decoder(decoder: str = "auto"):
    """Pick the decode callable: ``"stub"`` / ``"pil"`` force a branch,
    ``"auto"`` uses PIL when importable and the deterministic stub
    otherwise. Resolution must happen on the WORKER (executors may have
    codecs the driver lacks and vice versa), so callers pass the NAME
    into the closure and resolve inside the batch iterator."""
    if decoder == "stub":
        return _decode_image_stub
    if decoder == "pil":
        return _decode_image_pil
    if decoder != "auto":
        raise ValueError(f"unknown decoder {decoder!r}: use 'auto', 'stub' or 'pil'")
    try:
        import PIL.Image  # noqa: F401

        return _decode_image_pil
    except ImportError:
        return _decode_image_stub


def extract_media_meta(df: DataFrame, bin_col: str = "payload", decoder: str = "auto") -> DataFrame:
    """Typed metadata per blob via ``mapInPandas`` (iterator of Arrow
    batches — constant memory regardless of blob count per partition).
    ``decoder`` selects the image decode branch (see
    :func:`resolve_decoder`); a blob the selected decoder can't handle
    yields NULL width/height/feature rather than failing the batch."""
    id_cols = [c for c in df.columns if c != bin_col]
    out_ddl = ", ".join(f"{c} {t}" for c, t in df.select(*id_cols).dtypes) + ", " + MEDIA_META_SCHEMA
    decoder_name = decoder  # close over the NAME; resolve worker-side

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = resolve_decoder(decoder_name)
        for pdf in it:
            metas = []
            for b in pdf[bin_col]:
                if b is None:
                    metas.append((None, None, None, None, None))
                    continue
                b = bytes(b)
                mt = next((m for p, m in MAGIC if b.startswith(p)), "application/octet-stream")
                try:
                    w, h, feat = decode(b)
                except NotImplementedError:
                    w = h = None
                    feat = None
                except Exception:
                    # real codec rejecting a non-image/corrupt payload is
                    # data, not a bug: metadata stays NULL for that blob
                    w = h = None
                    feat = None
                metas.append((mt, len(b), w, h, feat))
            meta = pd.DataFrame(
                metas, columns=["media_type", "byte_len", "width", "height", "feature"]
            )
            yield pd.concat([pdf[id_cols].reset_index(drop=True), meta], axis=1)

    return df.mapInPandas(batches, schema=out_ddl)
