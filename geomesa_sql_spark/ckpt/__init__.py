from geomesa_sql_spark.ckpt.manifest import CheckpointedRun  # noqa: F401
