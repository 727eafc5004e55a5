from ip_filter_spark.plans.obst import GuideTree

__all__ = ["GuideTree"]
