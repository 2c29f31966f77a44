from netascore_spark.functions import access, attributes, vocab  # noqa: F401
