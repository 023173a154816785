from .binary import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_images,
    extract_features,
    sample_frames,
    synthesize_media,
)

__all__ = [
    "FEATURE_DIM",
    "MEDIA_SCHEMA",
    "decode_images",
    "extract_features",
    "sample_frames",
    "synthesize_media",
]
