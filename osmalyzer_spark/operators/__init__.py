from osmalyzer_spark.operators.knn import closest_join, radius_join

__all__ = ["radius_join", "closest_join"]
