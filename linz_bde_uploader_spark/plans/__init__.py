from linz_bde_uploader_spark.plans import workload  # noqa: F401
