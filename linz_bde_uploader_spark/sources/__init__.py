from linz_bde_uploader_spark.sources.crs import CrsHeader, read_crs, read_crs_header  # noqa: F401
