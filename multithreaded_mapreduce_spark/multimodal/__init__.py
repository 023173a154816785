from .binary import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    RESIZE_TARGET,
    decode_images,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)

__all__ = [
    "FEATURE_DIM",
    "MEDIA_SCHEMA",
    "RESIZE_TARGET",
    "decode_images",
    "extract_features",
    "resize_images",
    "sample_frames",
    "synthesize_media",
]
