from .session import get_spark, tuned_builder

__all__ = ["get_spark", "tuned_builder"]
