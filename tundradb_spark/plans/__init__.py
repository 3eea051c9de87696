from tundradb_spark.plans import audit

__all__ = ["audit"]
