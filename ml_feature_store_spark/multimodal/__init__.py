from .columns import (
    attach_binary_payload,
    decode_audio_stub,
    decode_image_stub,
    extract_image_features,
    frame_sample_stub,
    perceptual_hash_stub,
    resize_stub,
)

__all__ = [
    "attach_binary_payload",
    "decode_audio_stub",
    "decode_image_stub",
    "extract_image_features",
    "frame_sample_stub",
    "perceptual_hash_stub",
    "resize_stub",
]
