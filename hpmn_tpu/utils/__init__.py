from .asserts import validate_batch

__all__ = ["validate_batch"]
