from stakehouse_etl_spark.queries.catalog import QUERIES, QueryDef, oracle_map, query_map

__all__ = ["QUERIES", "QueryDef", "query_map", "oracle_map"]
