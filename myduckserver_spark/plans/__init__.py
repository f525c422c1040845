from myduckserver_spark.plans.registry import REGISTRY, all_oracles, all_queries

__all__ = ["REGISTRY", "all_oracles", "all_queries"]
