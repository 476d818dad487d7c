from .oracle import OracleIndex, to_rpn

__all__ = ["OracleIndex", "to_rpn"]
