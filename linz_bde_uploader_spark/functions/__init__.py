from linz_bde_uploader_spark.functions import dedup, similarity, text  # noqa: F401
