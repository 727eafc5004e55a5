from ip_filter_spark.operators.lpm import PathLPM, derive_prefix_table, exact_lpm

__all__ = ["PathLPM", "derive_prefix_table", "exact_lpm"]
