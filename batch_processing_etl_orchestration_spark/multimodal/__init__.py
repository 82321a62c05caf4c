from batch_processing_etl_orchestration_spark.multimodal.binary import (
    attach_binary_payload,
    extract_features,
    decode_media,
)

__all__ = ["attach_binary_payload", "extract_features", "decode_media"]
