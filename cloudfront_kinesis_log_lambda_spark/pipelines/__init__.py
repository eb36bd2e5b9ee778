from cloudfront_kinesis_log_lambda_spark.pipelines.training_data import (  # noqa: F401
    curate_documents,
    curation_report,
    pack_sequences,
    split_assign,
    split_column,
)
