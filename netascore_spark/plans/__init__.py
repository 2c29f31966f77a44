from netascore_spark.plans import profile  # noqa: F401
