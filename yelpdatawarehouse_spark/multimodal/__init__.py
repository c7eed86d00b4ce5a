from .columns import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_fake_media,
    decode_image_features,
    media_metadata,
    resize_images,
    sample_frames,
)
