from cdc_rs_spark.functions.encode import encode_value  # noqa: F401
