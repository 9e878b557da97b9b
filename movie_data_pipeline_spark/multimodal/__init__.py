from movie_data_pipeline_spark.multimodal.binary import (  # noqa: F401
    blob_features,
    decode_image,
    image_dimensions,
    image_header_expr,
    make_blob_table,
    sample_frames,
    wav_header_expr,
)
