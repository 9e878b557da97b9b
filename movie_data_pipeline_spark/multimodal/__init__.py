from movie_data_pipeline_spark.multimodal.binary import (  # noqa: F401
    blob_features,
    decode_image,
    make_blob_table,
    sample_frames,
)
