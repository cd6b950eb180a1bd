from stakehouse_etl_spark.functions import financials, scalars

__all__ = ["financials", "scalars"]
